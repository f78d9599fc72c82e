package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{QuantileDiscretizer, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** The reference's T4 feature pipeline (SURVEY.md §2g FP1–FP5) rebuilt on
  * `spark.ml`: StringIndexer per string column (任务四/exp4_work4.ipynb:
  * 152-165), QuantileDiscretizer on chosen numerics (:221), null
  * imputation (:127-128), VectorAssembler (:291) — generalised to any
  * table via column-name parameters.
  *
  * Scale: each StringIndexer.fit is one countByValue aggregate whose
  * result (the dictionary) is collected to the driver — fine as long as
  * cardinality is dictionary-sized; for high-cardinality categoricals use
  * `graft.ops.Features.stringIndex` (distributed join-back) instead.
  * QuantileDiscretizer fits a Greenwald–Khanna sketch in one pass
  * (approximate at any scale by design).
  */
object Pipelines {

  /** FP1+FP2: StringIndexer per column, chained in one Pipeline.
    * Default order frequencyDesc, ties alphabetical asc — the semantics
    * oracle'd by `Features.stringIndexDict`. */
  def stringIndexers(cols: Seq[String]): Seq[StringIndexer] =
    cols.map { c =>
      new StringIndexer()
        .setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep")
    }

  /** FP3: n-quantile bucketing of a numeric column (approximate cuts). */
  def quantileDiscretizer(c: String, buckets: Int): QuantileDiscretizer =
    new QuantileDiscretizer()
      .setInputCol(c).setOutputCol(s"${c}_bucket")
      .setNumBuckets(buckets).setHandleInvalid("keep")

  /** FP5: assemble feature columns into one `features` vector. */
  def assembler(cols: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")

  /** FP1+FP3+FP5 composed on the EXACT relational twins
    * (`Features.stringIndex` distributed dictionaries +
    * `Features.rangeNtileBucket` distributed exact ntile) with a real
    * `VectorAssembler` on top — same output contract as
    * [[featurePipeline]] but every feature value is SQL-derivable, so the
    * assembled vector itself is oracle-checkable (the GK-sketch cuts of
    * QuantileDiscretizer are approximate by design and never match an
    * exact-SQL oracle; MlPipelineSpec covers that estimator path). */
  def exactAssembled(df: DataFrame, stringCols: Seq[String],
      bucketCol: String, tieKey: String, buckets: Int): DataFrame = {
    val indexed = graft.ops.Features.stringIndex(df, stringCols)
    val bucketed = graft.ops.Features.rangeNtileBucket(
      indexed, bucketCol, tieKey, buckets)
    assembler(stringCols.map(_ + "_idx") :+ "bucket").transform(bucketed)
  }

  /** FP1–FP5 end-to-end: na.fill → indexers → discretizers → assembler,
    * one fitted PipelineModel. `numericBuckets` maps column → #buckets. */
  def featurePipeline(df: DataFrame, stringCols: Seq[String],
      numericCols: Seq[String],
      numericBuckets: Map[String, Int] = Map.empty): (PipelineModel, DataFrame) = {
    val filled = graft.ops.Features.naFill(df)
    val idx = stringIndexers(stringCols)
    val disc = numericBuckets.toSeq.sortBy(_._1)
      .map { case (c, n) => quantileDiscretizer(c, n) }
    val featCols = stringCols.map(_ + "_idx") ++
      numericBuckets.keySet.toSeq.sorted.map(_ + "_bucket") ++
      numericCols
    val pipe = new Pipeline().setStages(
      (idx ++ disc :+ assembler(featCols)).toArray)
    val model = pipe.fit(filled)
    (model, model.transform(filled))
  }
}
