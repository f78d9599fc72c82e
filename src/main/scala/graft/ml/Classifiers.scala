package graft.ml

import org.apache.spark.ml.classification.{
  LinearSVC, LogisticRegression, MultilayerPerceptronClassifier,
  RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's T4 classifier stage (SURVEY.md §2g FP6–FP12) rebuilt
  * seeded and with its two bugs fixed:
  *  - FP8: LinearSVC is evaluated on its OWN predictions (the ref's cell 33
  *    at 任务四/exp4_work4.ipynb:495 re-evaluated the logistic model's
  *    transform).
  *  - FP9: the MLP's output layer has 2 neurons for the 2-class label (the
  *    ref's `[42,64,32,1]` at exp4_work4.ipynb:536-537 crashed).
  *  - FP6: `randomSplit` is seeded (the ref's :326 is non-deterministic).
  *
  * Hyperparameters follow the reference where recorded: LR maxIter=10,
  * regParam=0.01 (:385, AUC 0.80); RF maxDepth=7, numTrees=30 (:572, AUC
  * 0.85; maxBins stays default — the ref's 700 existed only to cover a
  * 641-category indexed column); SVC maxIter=100 (:483). Metric is
  * areaUnderROC via BinaryClassificationEvaluator (:466,663 — README.md:378
  * mislabels it accuracy).
  *
  * Scale: every fit is iterative treeAggregate jobs over the training
  * DataFrame (SURVEY.md §3 E3) — data-parallel, no driver materialization
  * beyond coefficient vectors.
  */
object Classifiers {

  val Seed = 42L

  /** Binary-labeled vector features from the driver's embeddings table:
    * `features` = the 64-dim embedding, `label` = one-vs-rest on class 0.
    * (One compact cluster vs the rest is linearly separable, so the two
    * linear models are expected to learn it too; an arbitrary 5-vs-5
    * grouping of the 10 clusters is not.) */
  def embeddingFeatures(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      array_to_vector(col("embedding")).as("features"),
      (col("label") === 0).cast("double").as("label"))

  private def auc(predictions: DataFrame, rawCol: String = "rawPrediction"): Double =
    new BinaryClassificationEvaluator()
      .setRawPredictionCol(rawCol)
      .evaluate(predictions) // default metric: areaUnderROC (FP11)

  /** FP6–FP11: seeded 0.8/0.2 split, fit LR / LinearSVC / MLP / RF, each
    * evaluated on its own held-out predictions. Returns one row per model:
    * (model, auc, n_train, n_test) — deterministic given the seed, but ML
    * AUCs are never DuckDB-oracle'd (SURVEY §5 / §7). */
  def trainEval(spark: SparkSession, labeled: DataFrame,
      featureDim: Int = 64, seed: Long = Seed): DataFrame = {
    import spark.implicits._
    val Array(train, test) = labeled.randomSplit(Array(0.8, 0.2), seed)
    train.persist(); test.persist()
    val (nTrain, nTest) = (train.count(), test.count())

    val lr = new LogisticRegression()
      .setMaxIter(10).setRegParam(0.01) // FP7 (exp4_work4.ipynb:385)
    val svc = new LinearSVC().setMaxIter(100) // FP8 (:483)
    val mlp = new MultilayerPerceptronClassifier()
      .setLayers(Array(featureDim, 32, 16, 2)) // FP9 fixed: last layer = 2
      .setMaxIter(60).setSeed(seed)
    val rf = new RandomForestClassifier()
      .setMaxDepth(7).setNumTrees(30).setSeed(seed) // FP10 (:572)

    // fit the four models concurrently: each fit is a chain of
    // treeAggregate jobs that alone can't saturate the cluster; the
    // scheduler interleaves them (results are unaffected — independent
    // models, pinned seeds)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fits = Seq(
      "logistic_regression" -> Future(auc(lr.fit(train).transform(test))),
      "linear_svc" -> Future(auc(svc.fit(train).transform(test))),
      "mlp" -> Future(auc(mlp.fit(train).transform(test))),
      "random_forest" -> Future(auc(rf.fit(train).transform(test))))
    val rows = fits
      .map { case (m, f) => (m, Await.result(f, Duration.Inf), nTrain, nTest) }
    train.unpersist(); test.unpersist()
    rows.toDF("model", "auc", "n_train", "n_test").orderBy("model")
  }

  /** FP10+FP12: fit the RF alone and surface per-feature impurity
    * importances as rows (feature_idx, importance) — the ref's bar-chart
    * data at exp4_work4.ipynb:614. */
  def rfImportances(spark: SparkSession, labeled: DataFrame,
      seed: Long = Seed): DataFrame = {
    import spark.implicits._
    val model = new RandomForestClassifier()
      .setMaxDepth(7).setNumTrees(30).setSeed(seed)
      .fit(labeled)
    model.featureImportances.toArray.zipWithIndex
      .map { case (imp, i) => (i, imp) }
      .toSeq.toDF("feature_idx", "importance")
      .orderBy("feature_idx")
  }
}
