package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

/** Scale soak for the raw-crawl front door ([[graft.sources.Warc]] +
  * [[graft.llm.Extract]] + [[graft.llm.Classifier]]): synthesizes a
  * multi-file gzip WARC crawl far past the spec fixtures — each file a
  * multi-member gzip of HTML response records, the CommonCrawl shape —
  * then measures (1) the full container drain + extraction rate
  * (records/s and compressed MB/s; the kernel streams, so per-task
  * memory is one record body regardless of file size), (2) that a
  * planted oversized record truncates at `maxBodyBytes` instead of
  * buffering, with framing intact after it, and (3) in-pipeline
  * classifier training over the extracted corpus with planted labels
  * (accuracy must be 100% — the cue tokens are linearly separable).
  * Planted expectations make the run self-checking; results recorded
  * in BASELINE.md, this main keeps them reproducible.
  *
  * {{{ runMain graft.SoakCrawl [nFiles] [recordsPerFile] }}}
  */
object SoakCrawl {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 64
    val perFile = if (args.length > 1) args(1).toInt else 2000
    val spark = GraftSession.get()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-crawl-")
      .toString // String: the generator closure must serialize

    // ---- synthesize the crawl (driver-parallel, one file per task) --
    def page(f: Int, r: Int): String = {
      val y = (f + r) % 2
      val cue = if (y == 1) "goodsig goodsig" else "badsig badsig"
      val para = (0 until 20).map(i => s"w${(f * 31 + r * 7 + i) % 997}")
        .mkString(" ")
      s"""<html><head><title>Doc $f-$r</title><style>p{x:1}</style></head>
         |<body><script>var a = 1 < 2;</script><!-- c --><h1>H $f $r</h1>
         |<p>$para &amp; tail $cue</p></body></html>""".stripMargin
    }
    def record(f: Int, r: Int): Array[Byte] = {
      val payload = page(f, r).getBytes(UTF_8)
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
        .getBytes(UTF_8) ++ payload
      val hdr = Seq(
        "WARC/1.0", "WARC-Type: response",
        s"WARC-Record-ID: <urn:doc:$f-$r>",
        s"WARC-Target-URI: http://soak.example/$f/$r",
        "Content-Type: application/http; msgtype=response",
        s"Content-Length: ${http.length}", "", "").mkString("\r\n")
      hdr.getBytes(UTF_8) ++ http ++ "\r\n\r\n".getBytes(UTF_8)
    }
    val t0 = System.nanoTime()
    val genBytes = spark.sparkContext.parallelize(0 until nFiles, nFiles)
      .map { f =>
        val path = java.nio.file.Paths.get(s"$dir/seg$f.warc.gz")
        val bos = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(path), 1 << 16)
        var written = 0L
        (0 until perFile).foreach { r =>
          val gz = new java.util.zip.GZIPOutputStream(bos) // one member/record
          val b = record(f, r); gz.write(b); gz.finish(); written += b.length
        }
        bos.close()
        written
      }.sum()
    val compressed = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).toArray.map(p =>
        java.nio.file.Files.size(p.asInstanceOf[java.nio.file.Path])).sum
    println(f"[soak-crawl] generated ${nFiles * perFile} records, " +
      f"raw ${genBytes / 1e6}%.1f MB, gzip ${compressed / 1e6}%.1f MB " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // ---- 1) full drain + extraction ---------------------------------
    val t1 = System.nanoTime()
    val docs = graft.sources.Warc.documents(spark, s"$dir/seg*.warc.gz")
      .localCheckpoint(true)
    val n = docs.count()
    val drainSec = (System.nanoTime() - t1) / 1e9
    require(n == nFiles.toLong * perFile, s"drained $n of ${nFiles * perFile}")
    val sample = docs.filter(col("doc_id") === "<urn:doc:0-1>")
      .select(col("text")).as[String].head()
    require(sample.contains("& tail goodsig") && !sample.contains("var a"),
      s"extraction wrong: ${sample.take(120)}")
    println(f"[soak-crawl] drain+extract $n records in $drainSec%.1f s = " +
      f"${n / drainSec}%.0f rec/s, ${compressed / 1e6 / drainSec}%.1f " +
      "gzip-MB/s")

    // ---- 2) oversized-record truncation stays bounded ---------------
    val bigDir = java.nio.file.Files.createTempDirectory("graft-soak-big-")
    val bigBody = ("x" * (8 << 20)).getBytes(UTF_8) // 8 MB record
    val hdr = Seq("WARC/1.0", "WARC-Type: conversion",
      "WARC-Record-ID: <urn:big>", "WARC-Target-URI: http://big",
      "Content-Type: text/plain", s"Content-Length: ${bigBody.length}",
      "", "").mkString("\r\n").getBytes(UTF_8)
    val tail = record(0, 0)
    java.nio.file.Files.write(bigDir.resolve("big.warc"),
      hdr ++ bigBody ++ "\r\n\r\n".getBytes(UTF_8) ++ tail)
    val capped = graft.sources.Warc.records(spark, s"$bigDir/big.warc",
      maxBodyBytes = 1 << 16)
    val rows = capped.select(col("record_id"), col("truncated"),
      length(col("body")).as("len")).collect()
    require(rows.length == 2, s"framing broke after the big record: ${rows.length}")
    val big = rows.find(_.getString(0) == "<urn:big>").get
    require(big.getBoolean(1) && big.getInt(2) == (1 << 16),
      s"truncation failed: $big")
    println(s"[soak-crawl] 8 MB record truncated to 64 KB, framing intact")

    // ---- 2b) crawl-level digest dedup at drain rate ------------------
    // Re-read with a planted digest scheme: every record whose r is
    // even shares a digest with its r+1 neighbor IN THE SAME FILE, so
    // exactly half the even-r pairs collapse; odd fixture arithmetic
    // keeps the expectation exact without a second corpus. The digest
    // rides the header columns, so the dedup pass costs one shuffle of
    // the records and zero extraction work for the dropped copies.
    val t1b = System.nanoTime()
    val recs = graft.sources.Warc.records(spark, s"$dir/seg*.warc.gz")
      .withColumn("payload_digest",
        concat(lit("sha1:"), regexp_extract(col("record_id"),
          ":([0-9]+)-", 1), lit("-"),
          (regexp_extract(col("record_id"), "-([0-9]+)>", 1)
            .cast("long") / 2).cast("long")))
    val deduped = graft.sources.Warc.dedupByDigest(recs).count()
    val dedupSec = (System.nanoTime() - t1b) / 1e9
    val expectKeep = nFiles.toLong * ((perFile + 1) / 2)
    require(deduped == expectKeep,
      s"digest dedup kept $deduped, want $expectKeep")
    println(f"[soak-crawl] digest dedup ${nFiles * perFile} -> " +
      f"$deduped records in $dedupSec%.1f s = " +
      f"${nFiles.toLong * perFile / dedupSec}%.0f rec/s")

    // ---- 2c) block-granular boilerplate at drain rate ----------------
    // The jusText-style pass over the RAW pages (markedText chain +
    // explode + doc-keyed reassembly): nav/footer links in the
    // synthetic pages drop, the paragraph survives — planted
    // expectations keep it self-checking at any scale.
    val rawPages = recs.select(col("record_id").as("doc_id"),
      graft.functions.HttpBodyText(col("body")).as("html"))
      .localCheckpoint(true)
    val t1c = System.nanoTime()
    val blocks = graft.llm.Extract.mainContentBlocks(
      rawPages, "html", "doc_id")
    val nGoodTotal = blocks.agg(sum(col("n_good"))).head().getLong(0)
    val blockSec = (System.nanoTime() - t1c) / 1e9
    require(nGoodTotal == nFiles.toLong * perFile,
      s"expected one good block per page, got $nGoodTotal")
    val mainSample = blocks.filter(col("doc_id") === "<urn:doc:0-1>")
      .select(col("main_text")).as[String].head()
    require(mainSample.contains("& tail goodsig") &&
      !mainSample.contains("H 0 1"),
      s"block classification wrong: ${mainSample.take(120)}")
    println(f"[soak-crawl] mainContentBlocks over $n pages in " +
      f"$blockSec%.1f s = ${n / blockSec}%.0f pages/s " +
      f"(n_good=$nGoodTotal, headings/nav dropped)")

    // ---- 3) classifier training over the extracted corpus -----------
    val labeled = docs.withColumn("y",
      when(col("text").contains("goodsig"), 1L).otherwise(0L))
    val t2 = System.nanoTime()
    val w = graft.llm.Classifier.train(labeled, "text", "y", "doc_id",
      buckets = 4096, iters = 3)
    val trainSec = (System.nanoTime() - t2) / 1e9
    val scored = labeled.withColumn("s", graft.functions.HashedBowScore(
      graft.functions.TextFunctions.tokens(col("text")),
      graft.llm.Classifier.weightsColumn(w)))
    val wrong = scored.filter((col("s") > 0) =!= (col("y") === 1L)).count()
    println(f"[soak-crawl] classifier: 3 iters over $n docs in " +
      f"$trainSec%.1f s, misclassified $wrong")
    require(wrong == 0, s"$wrong misclassified")
    println("[soak-crawl] OK")
  }
}
