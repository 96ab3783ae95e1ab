package graft

import graft.operators.Corpus
import graft.sources.Sources
import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-shard export: BPE-train on the corpus, encode
  * every doc map-only (broadcast merges), pack token streams into
  * budgeted chunks per hash shard, write scanner-prunable shard
  * directories — then prove the export is LOSSLESS (every doc decodes
  * back to its normalized text), complete (every doc exactly once),
  * budget-respecting, and deterministic across runs. The compose is
  * the deliverable: train → encode → pack → sink are the existing
  * operators, chained the way a real pipeline would. */
class ExportSpec extends AnyFunSuite {
  import TestSession._

  test("BPE shard export: lossless, complete, budgeted, deterministic") {
    val docs = Tables.documents(spark, sf).limit(120)
      .select(col("doc_id"), col("text")).cache()
    val merges = Bpe.train(Bpe.wordCounts(docs, "text"), nMerges = 30)
    assert(merges.nonEmpty)

    def buildExport(outDir: String): Unit = {
      val enc = Bpe.encodeCorpus(docs, col("doc_id"), col("text"), merges)
      val packed = Corpus.packSequencesSharded(enc,
        keyCol = lit("train"), orderCol = col("id"),
        tokensCol = col("n_tokens"), budget = 2000L, nShards = 4)
      Sources.writeBatched(
        packed.select(col("id"), col("tokens"), col("n_tokens"),
          col("pack_shard"), col("chunk_id")),
        statusCol = "pack_shard", fileIdxCol = "chunk_id", outDir)
    }

    val out1 = java.nio.file.Files.createTempDirectory("graft_export").toString
    buildExport(out1)
    val back = spark.read.parquet(out1).cache()

    // complete: every doc exactly once
    assert(back.count() == docs.count())
    assert(back.select("id").distinct().count() == docs.count())

    // lossless: separator-split tokens reassemble the normalized text
    val decode = udf { (tokens: Seq[String]) =>
      tokens.foldLeft(Vector("")) { (acc, t) =>
        if (t == "␠") acc :+ "" else acc.updated(acc.length - 1, acc.last + t)
      }.mkString(" ")
    }
    val mismatch = back.select(col("id"), decode(col("tokens")).as("rt"))
      .join(docs.select(col("doc_id").as("id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm")), "id")
      .filter(col("rt") =!= col("norm"))
    assert(mismatch.count() == 0,
      s"round-trip mismatch: ${mismatch.take(1).mkString}")

    // budgeted: chunk token totals <= budget + one straddling doc
    val maxDoc = back.agg(max("n_tokens")).head().getLong(0)
    val over = back.groupBy("pack_shard", "chunk_id")
      .agg(sum("n_tokens").as("chunk_tokens"))
      .filter(col("chunk_tokens") > lit(2000L) + lit(maxDoc))
    assert(over.count() == 0)

    // deterministic: a second export is row-identical
    val out2 = java.nio.file.Files.createTempDirectory("graft_export2").toString
    buildExport(out2)
    val back2 = spark.read.parquet(out2)
    assert(back.exceptAll(back2).isEmpty && back2.exceptAll(back).isEmpty)

    back.unpersist(); docs.unpersist()
    ()
  }

  test("JSONL shard export: round-trips, shard-pruned layout, manifest accounts bytes") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"), col("lang"),
        pmod(col("doc_id"), lit(4)).as("shard"))
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Sources.writeJsonlShards(docs, "shard", out)
    // round-trip: every row back, columns intact
    val back = spark.read.json(s"$out/data/shard=*").cache()
    assert(back.count() == 100)
    val orig = docs.select(col("doc_id"), col("text"), col("lang"))
    assert(back.select("doc_id", "text", "lang").exceptAll(orig).isEmpty
      && orig.exceptAll(back.select("doc_id", "text", "lang")).isEmpty)
    // layout: one directory per shard, path-prunable
    val shardDirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // manifest: per-shard rows match, bytes equal the on-disk data size
    val man = spark.read.parquet(s"$out/_manifest").cache()
    assert(man.agg(sum("n_rows")).head.getLong(0) == 100)
    val diskBytes = shardDirs.map { d =>
      new java.io.File(s"$out/data/$d").listFiles()
        .filter(_.getName.endsWith(".txt")).map(_.length()).sum
    }.sum
    assert(man.agg(sum("n_bytes")).head.getLong(0) == diskBytes,
      "manifest bytes disagree with the files on disk")
    man.unpersist(); back.unpersist()
    ()
  }

  test("JSONL manifest bills OCTETS, not characters, on non-ASCII rows") {
    import spark.implicits._
    // curly quotes, accents, CJK, an emoji — every row multi-byte in
    // UTF-8, so a character-count manifest would under-bill and the
    // transfer job would delete a source it hasn't fully copied
    // (ADVICE r13: length() vs octet_length()).
    val docs = Seq(
      (1L, "Jiří “devo-265” • résumé", 0),
      (2L, "東京都 ümläut 😀", 1),
      (3L, "plain ascii line", 0)).toDF("doc_id", "text", "shard")
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_u8").toString
    Sources.writeJsonlShards(docs, "shard", out)
    val man = spark.read.parquet(s"$out/_manifest")
    val diskBytes = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".txt")).map(_.length()).sum
    val billed = man.agg(sum("n_bytes")).head.getLong(0)
    assert(billed == diskBytes,
      s"manifest billed $billed, files hold $diskBytes")
    // and the character count genuinely differs here — the test would
    // not regress silently if the fixture lost its multi-byte rows
    val chars = docs.select(col("shard"),
      to_json(struct(col("doc_id"), col("text"))).as("l"))
      .agg(sum(length(col("l")))).head.getLong(0) + 3
    assert(chars < diskBytes, "fixture must be multi-byte to bite")
    ()
  }
}
