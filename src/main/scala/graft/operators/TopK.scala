package graft.operators

import org.apache.spark.sql.DataFrame

import graft.plans.{TopKPerKey, TopKStrategy}

/** User-facing entry for the custom top-k-per-key operator
  * (see [[graft.plans.TopKPerKey]]).
  */
object TopK {

  /** Rows that `row_number() OVER (PARTITION BY keys ORDER BY
    * orderCol DESC, tieCol ASC) <= k` would keep — planned as
    * partial/final bounded-heap pruning instead of a window sort.
    * Registers the planner strategy on the frame's session if needed.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
             tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not in ${analyzed.output.map(_.name)}"))
    val plan = TopKPerKey(keyCols.map(attr), attr(orderCol), attr(tieCol), k, analyzed)
    org.apache.spark.sql.GraftBridge.ofRows(spark, plan)
  }
}
