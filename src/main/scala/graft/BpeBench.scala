package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Batched-BPE merge-learning bench at a realistic vocab slice (VERDICT r4
 * #5): [[graft.pipeline.Bpe.learnMergesWithRounds]] on a deterministic
 * synthetic corpus rich enough to sustain 512-1024 merges, at the batch
 * widths the 32k-vocab deployment would use. The claims under test:
 *
 *  - rounds ≈ merges / acceptedPerRound — the driver round-trip count (the
 *    thing that dominates wall-clock at scale, one Spark job pipeline per
 *    round) shrinks by ~the accepted-batch width;
 *  - wall-time is SUBLINEAR in merges at fixed batchK, and ~flat in merges
 *    when batchK grows with them — the q67 claim extrapolated ~10-50x.
 *
 * Corpus: `docs` rows of 40 words drawn Zipf-ishly (quadratic skew) from a
 * `vocab`-word lexicon of 6-12 letter pseudo-random strings over a 20-letter
 * alphabet — generated on the executors from `spark.range`, no I/O in the
 * measured window. Deterministic in (docs, vocab).
 *
 * Usage: runMain graft.BpeBench [cores] [docs] [vocab]
 * Prints one JSON line per (merges, batchK) cell with seconds + rounds.
 */
object BpeBench {

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val vocab = args.lift(2).map(_.toInt).getOrElse(20000)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("bpebench-ckpt").toString)
    import spark.implicits._

    // word j of the lexicon: 6-12 pseudo-random letters, deterministic in j
    def wordOf(j: Long): String = {
      val len = 6 + (graft.fixtures.SiteGen.mix(j, 77L) % 7L).toInt.abs
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        sb.append(('a' + (graft.fixtures.SiteGen.mix(j, i.toLong) % 20L).toInt.abs).toChar)
        i += 1
      }
      sb.toString
    }
    val vocabB = spark.sparkContext.broadcast(Array.tabulate(vocab)(j => wordOf(j.toLong)))

    val docs = spark.range(nDocs).map { d =>
      val words = vocabB.value
      val sb = new StringBuilder
      var k = 0
      while (k < 40) {
        if (k > 0) sb.append(' ')
        // quadratic Zipf-ish skew toward low word ids
        val u = (graft.fixtures.SiteGen.mix(d, k.toLong) % 1000000L).abs / 1000000.0
        sb.append(words((u * u * words.length).toInt.min(words.length - 1)))
        k += 1
      }
      sb.toString
    }.toDF("text").persist()
    val tokens = docs.count() * 40

    // (merges, batchK) grid: the sequential shape small (per-round cost
    // anchor), then 512 at 8/16 and 1024 at 16 (the deployment widths)
    val cells = Seq((64, 1), (512, 8), (512, 16), (1024, 16))
    val out = cells.map { case (m, bk) =>
      val t0 = System.nanoTime()
      val (df, rounds) = graft.pipeline.Bpe.learnMergesWithRounds(
        docs, "text", merges = m, batchK = bk)
      val learned = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val cell =
        s"""{"merges":$m,"batchK":$bk,"learned":$learned,"rounds":$rounds,""" +
        s""""seconds":${f"$secs%.2f"},"merges_per_round":${f"${learned.toDouble / rounds}%.1f"}}"""
      System.err.println(cell)
      cell
    }
    println(
      s"""{"metric":"bpe_batched_rounds","cores":$cores,"docs":$nDocs,""" +
      s""""vocab":$vocab,"tokens":$tokens,"cells":[${out.mkString(",")}]}""")
    spark.stop()
  }
}
