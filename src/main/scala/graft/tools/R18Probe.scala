package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** r18 optimization-round diagnostic: WARM per-component wall times
  * for the cluster-family pipeline (best of N reps after a warmup
  * rep, the bench's own steady-state convention) so optimization
  * targets the component that actually costs, not the cold-run mix.
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("SPARK_GRAFT_EXCLUDE", ""))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B knob integrity (r18 ADVICE): when SPARK_GRAFT_EXCLUDE is
    // explicitly set, the probe must honor it VERBATIM — the full
    // installer would unconditionally append the
    // InferFiltersFromGenerate exclusion and neutralize the
    // pre-exclusion baseline this probe exists to measure. The
    // expression-level null-check simplifier is orthogonal to rule
    // exclusion and installs on both arms.
    if (sys.env.contains("SPARK_GRAFT_EXCLUDE")) {
      val cur = spark.experimental.extraOptimizations
      if (!cur.contains(graft.plans.SimplifyBothWaysNullChecks))
        spark.experimental.extraOptimizations =
          cur :+ graft.plans.SimplifyBothWaysNullChecks
    } else graft.GraftExtensions.installNullCheckSimplifier(spark)
    def bench(label: String)(f: => Long): Unit = {
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // drop rep 0 (warm-up), report min of the rest
      val best = times.drop(1).map(_._1).min
      println(f"PROBE $label%-28s ${best}%6.3f s  (rows=${times.head._2})")
    }
    val docs = Dedup.augmentedDocs(spark, dir)
    bench("augmentedDocs.count") { docs.count() }
    bench("shingle pass") {
      Dedup.withHashedShingles(docs).localCheckpoint(false).count()
    }
    val s = Dedup.withHashedShingles(docs).localCheckpoint(true)
    bench("minhash sigs (on ckpt)") {
      Dedup.minhashSignatures(s, 8).count()
    }
    bench("banded sigs (on ckpt)") {
      Dedup.bandedSignatures(s, 8, 4).count()
    }
    bench("lsh cands+verify (on ckpt)") {
      Dedup.minhashLshShingled(s, 8, 4, 0.8).count()
    }
    bench("minhashLsh full") {
      Dedup.minhashLsh(docs, 8, 4, 0.8).count()
    }
    val pairs = Dedup.minhashLsh(docs, 8, 4, 0.8).localCheckpoint(true)
    bench("cc adaptive (on ckpt pairs)") {
      Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id").count()
    }
    bench("d8 full") {
      graft.SparkEntry.queries("d8_cluster")(spark, dir).count()
    }
    bench("d18 full") {
      graft.SparkEntry.queries("d18_cluster_rep")(spark, dir).count()
    }
    bench("ngramJaccard (d2)") {
      Dedup.ngramJaccard(docs, 0.8, 25).count()
    }
    // --- d25 strip family ---
    val d25docs = {
      val hdrs = array(Seq(
        "subscribe to our newsletter for updates",
        "all rights reserved by the publisher",
        "click here to accept cookie policy",
        "share this article on social feed").map(lit): _*)
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          concat(element_at(hdrs, pmod(col("doc_id"), lit(4)).cast("int") + 1),
            lit(" "), trim(col("text"))).as("text"))
    }
    bench("d25 split only") {
      d25docs.select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("tks"))
        .select(size(col("tks")).as("n")).agg(sum("n")).count()
    }
    bench("d25 transform chunks") {
      val toks = d25docs.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tks"))
      toks.select(col("doc_id"),
          transform(
            sequence(lit(0), expr("(size(tks) - 1) div 3")),
            i => array_join(slice(col("tks"), i * 3 + 1, lit(3)), " "))
            .as("chunks"))
        .select(size(col("chunks")).as("n")).agg(sum("n")).count()
    }
    bench("d25 posexplode tks") {
      d25docs.select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("tks"))
        .select(col("doc_id"), posexplode(col("tks")).as(Seq("p", "t")))
        .count()
    }
    bench("d25 fanout count-only") {
      Dedup.docChunks(d25docs, 3).select(lit(1).as("one")).count()
    }
    bench("d25 docChunks fanout") {
      Dedup.docChunks(d25docs, 3).count()
    }
    bench("d25 fanout+md5 key") {
      Dedup.docChunks(d25docs, 3)
        .select(col("doc_id"), col("pos"), md5(col("chunk")).as("ck"))
        .count()
    }
    bench("d25 hot set") {
      val ex = Dedup.docChunks(d25docs, 3)
      ex.groupBy("chunk").agg(count(lit(1)).as("occ"))
        .filter(col("occ") >= 3).count()
    }
    bench("d25 full strip") {
      Dedup.boilerplateStrip(d25docs, 3, 3L).count()
    }
    bench("d27 full") {
      graft.SparkEntry.queries("d27_internal_repeats")(spark, dir).count()
    }
    // --- m5 phash ---
    val m5hashed = {
      val d = graft.Tables.documents(spark, dir).filter(col("n_chars") >= 64)
      val base = d.select(col("doc_id").as("id"), col("text"))
      val planted = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(substring(col("text"), 1, 7), lit("q"),
            expr("substring(text, 9)")).as("text"))
      base.unionByName(planted)
    }
    bench("m5 blockHash60 stage") {
      m5hashed.select(col("id"),
        graft.multimodal.Multimodal.blockHash60(col("text").cast("binary"))
          .as("phash")).agg(sum("phash")).count()
    }
    bench("m5 hash+chunks fanout") {
      val h = m5hashed.select(col("id"),
        graft.multimodal.Multimodal.blockHash60(col("text").cast("binary"))
          .as("phash"))
      h.select(col("id"), col("phash"),
          posexplode(array((0 until 6).map(c =>
            shiftrightunsigned(col("phash"), c * 10)
              .bitwiseAND(lit((1L << 10) - 1))): _*))
            .as(Seq("chunk_idx", "chunk_val")))
        .count()
    }
    bench("m5 candidates (pre-filter)") {
      val h = m5hashed.select(col("id"),
        graft.multimodal.Multimodal.blockHash60(col("text").cast("binary"))
          .as("phash"))
      val chunks = h.select(col("id"), col("phash"),
          posexplode(array((0 until 6).map(c =>
            shiftrightunsigned(col("phash"), c * 10)
              .bitwiseAND(lit((1L << 10) - 1))): _*))
            .as(Seq("chunk_idx", "chunk_val")))
        .hint("shuffle_hash")
      chunks.as("a").join(chunks.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk_val") === col("b.chunk_val") &&
            col("a.id") < col("b.id"))
        .count()
    }
    bench("m5 full") {
      graft.SparkEntry.queries("m5_phash_dedup")(spark, dir).count()
    }
    bench("x19 full") {
      graft.SparkEntry.queries("x19_mlt")(spark, dir).count()
    }
    bench("d20 full") {
      graft.SparkEntry.queries("d20_semdedup_rep")(spark, dir).count()
    }
    bench("d11 full") {
      graft.SparkEntry.queries("d11_semdedup")(spark, dir).count()
    }
    spark.stop()
  }
}
