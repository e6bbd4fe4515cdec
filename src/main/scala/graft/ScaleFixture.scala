package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement tool (guide §1 / r20 verdict item 5):
  * synthesizes a LARGER deterministic fixture from an existing one so
  * parallel scaling (8 vs 32 cores) can be measured at an SF where the
  * heavy queries are compute-bound rather than job-latency-bound — the
  * r20 scaling block's 0.80–1.19 ratios at sf0.1 measured per-stage
  * overhead, not the operators. Not part of the driver contract; never
  * timed; writes only under the given output dir (never touches
  * /root/testdata).
  *
  * Construction: `factor` disjoint copies of `documents`/`embeddings`
  * with ids offset by copy·10⁷ (the shared doc/vec id space is
  * preserved) and each copy's text passed through a rotated-alphabet
  * `translate` — deterministic, length-preserving, and vocabulary-
  * disjoint across copies, so the dedup/minhash families scale their
  * WORK ~linearly instead of drowning in cross-copy duplicate pairs
  * (20 verbatim copies of every doc would turn each near-dup cluster
  * into a 20²-pair clique — a different workload, not a bigger one).
  * Copy 0 is the original fixture verbatim. The small relational
  * tables copy through unchanged.
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <outDir> <factor>
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 1000, s"bad factor $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(k: Int) = lower.drop(k % 26) + lower.take(k % 26)

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until factor).map { c =>
      docs.select(
        (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        (if (c == 0) col("text")
         else translate(col("text"), lower, rot(c))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until factor).map { c =>
      emb.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
    println(s"[scalefixture] $outDir = $factor x $srcDir")
    spark.stop()
  }
}
