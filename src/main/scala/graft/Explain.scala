package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for headline queries — the
  * plan-quality audit trail: parquet filter pushdown (PushedFilters),
  * column pruning (ReadSchema), broadcast joins for dictionary encode,
  * partial aggregation, and whole-stage codegen spans.
  *
  * Run: `sbt "runMain graft.Explain /root/testdata/sf0.01 q1_agg ..."`
  * (no names = a representative default set).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_oracle_card", "q1_agg", "q_discretize", "q_dedup_keep_first",
        "q_ann_topk", "q_token_counts", "q_stratified_sample",
        "q_pack_sequences", "q_decontaminate")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      Queries.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
