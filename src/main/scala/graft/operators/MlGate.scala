package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Classifier-based quality filtering — the modern curation step where
  * a small model, trained with weak supervision from heuristic labels
  * on a REFERENCE corpus, gates the incoming batch (the shape of
  * FineWeb-Edu-style filtering; the heuristic twin is `tx_quality`,
  * the LM twin `tx_lm_gate`).
  *
  * Scale notes: features are pure Column expressions computed in the
  * scan stage; training reduces the reference corpus to a
  * 4-coefficient model via treeAggregate (driver holds coefficients,
  * never rows); scoring is one broadcast-model projection over the
  * batch — no shuffle anywhere in the gate.
  */
object MlGate {

  val featureCols: Seq[String] = Seq("f_tokens", "f_stop", "f_punct", "f_chars")

  /** Column-expression features (no UDFs — same primitives the
    * heuristic score uses, so the classifier can only refine, not
    * hallucinate, the signal).
    *
    * Degenerate rows are defended here, not in VectorAssembler: an
    * empty string makes the ratio features 0.0/0 = NaN and a null text
    * makes them null — either one kills the WHOLE train/score job
    * inside the assembler (handleInvalid defaults to "error"). One
    * garbage row must score as garbage, not fail the gate.
    */
  def featurize(docs: DataFrame, textCol: String): DataFrame = {
    def safe(c: Column): Column = {
      val guarded = when(length(col(textCol)) > 0, c).otherwise(lit(0.0))
      coalesce(nanvl(guarded, lit(0.0)), lit(0.0))
    }
    docs
      .withColumn("f_tokens", safe(TextFunctions.tokenCount(col(textCol)).cast("double")))
      .withColumn("f_stop", safe(TextFunctions.stopwordRatio(col(textCol))))
      .withColumn("f_punct", safe(TextFunctions.punctRatio(col(textCol))))
      .withColumn("f_chars", safe(length(col(textCol)).cast("double")))
  }

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("features").transform(df)

  /** Train on a reference corpus with weak labels = heuristic quality
    * score ≥ `tau` (no hand labels anywhere — the classifier
    * generalizes the heuristic).
    */
  def train(reference: DataFrame, textCol: String, tau: Double): LogisticRegressionModel = {
    val labeled = featurize(reference, textCol)
      .withColumn("label",
        when(TextFunctions.qualityScore(col(textCol)) >= tau, 1.0).otherwise(0.0))
    new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(assemble(labeled))
  }

  /** Score a batch: adds `prediction` (1.0 = keep). */
  def score(model: LogisticRegressionModel, batch: DataFrame, textCol: String): DataFrame =
    model.transform(assemble(featurize(batch, textCol)))
}
