package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[QualityClassifier]]: the full-batch integer
  * perceptron vs a sequential reference, bit-equal weights under any
  * partitioning, convergence/early-stop/maxEpochs behavior, and the
  * shuffle-free scoring plan. */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("quality-classifier-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val B = 64
  private val bucketFn = QualityClassifier.xxBucket(B)

  /** Sequential reference: same featurize + batch-perceptron recurrence. */
  private def refTrain(docs: Seq[(Boolean, String)], maxEpochs: Int = 10)
      : (Array[Long], Int, Long) = {
    def feats(t: String): Map[Int, Long] =
      t.split("\\s+").filter(_.nonEmpty).groupBy(bucketFn)
        .map { case (b, ws) => b -> ws.length.toLong }
    val xs = docs.map { case (y, t) => (if (y) 1L else -1L, feats(t)) }
    val w = new Array[Long](B + 1)
    var epoch = 0
    var errors = -1L
    while (epoch < maxEpochs && errors != 0L) {
      val upd = new Array[Long](B + 1)
      errors = 0L
      xs.foreach { case (y, f) =>
        val m = w(B) + f.map { case (b, c) => w(b) * c }.sum
        if (y * m <= 0L) {
          f.foreach { case (b, c) => upd(b) += y * c }
          upd(B) += y
          errors += 1
        }
      }
      for (b <- 0 to B) w(b) += upd(b)
      epoch += 1
    }
    (w, epoch, errors)
  }

  // separable but with SHARED vocab across classes: markers dominate,
  // fillers overlap — the interesting (non-disjoint) convergence case
  private val sepDocs: Seq[(Boolean, String)] = (0 until 40).map { i =>
    val good = i % 2 == 0
    val marker = (if (good) "excellent " else "garbage ") * (3 + i % 3)
    (good, marker + s"the quick filler f${i % 5} common words here")
  }

  test("distributed training is bit-equal to the sequential reference and " +
      "to itself under different partitionings") {
    val (refW, refE, refErr) = refTrain(sepDocs)
    for (parts <- Seq(1, 2, 8)) {
      val df = spark.createDataset(sepDocs).toDF("label", "text")
        .repartition(parts)
      val m = QualityClassifier.trainOnText(df, "text", col("label"),
        buckets = B, bucket = bucketFn)
      assert(m.weights.toSeq == refW.toSeq, s"weights diverged at $parts")
      assert(m.epochs == refE && m.lastErrors == refErr)
    }
  }

  test("converged model predicts its training labels exactly (ties are " +
      "errors in training, so margin > 0 iff positive)") {
    val df = spark.createDataset(sepDocs.zipWithIndex.map {
      case ((y, t), i) => (i.toLong, y, t)
    }).toDF("id", "label", "text")
    val m = QualityClassifier.trainOnText(df, "text", col("label"),
      buckets = B, bucket = bucketFn)
    assert(m.lastErrors == 0L, "planted classes must separate")
    val scored = QualityClassifier.score(df, "id", "text", m, bucketFn)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    sepDocs.zipWithIndex.foreach { case ((y, _), i) =>
      assert(scored(i.toLong) == y, s"doc $i")
    }
  }

  test("non-separable data runs maxEpochs and reports residual errors") {
    val docs = Seq((true, "same text twice"), (false, "same text twice"))
    val df = spark.createDataset(docs).toDF("label", "text")
    val m = QualityClassifier.trainOnText(df, "text", col("label"),
      buckets = B, bucket = bucketFn, maxEpochs = 4)
    assert(m.epochs == 4)
    assert(m.lastErrors > 0L)
  }

  test("degenerate docs: empty/whitespace text is a bias-only row") {
    val docs = Seq((true, ""), (true, "   "), (false, "only real tokens"))
    val df = spark.createDataset(docs).toDF("label", "text")
    // bias must separate empty-positives from the token-bearing negative
    val m = QualityClassifier.trainOnText(df, "text", col("label"),
      buckets = B, bucket = bucketFn)
    assert(m.lastErrors == 0L)
    val scored = QualityClassifier
      .score(df.withColumn("id", monotonically_increasing_id()),
        "id", "text", m, bucketFn)
      .collect()
    assert(scored.length == 3)
  }

  test("scoring plan is one kernel scan — no Exchange before the output") {
    val df = spark.createDataset(sepDocs.zipWithIndex.map {
      case ((y, t), i) => (i.toLong, y, t)
    }).toDF("id", "label", "text")
    val m = QualityClassifier.trainOnText(df, "text", col("label"),
      buckets = B, bucket = bucketFn)
    val plan = QualityClassifier.score(df, "id", "text", m, bucketFn)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
