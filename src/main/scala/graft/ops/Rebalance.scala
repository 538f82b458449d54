package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional scan rebalance — the "cheap scan, expensive map" gate.
  *
  * When per-row work (regex scoring, tokenization, JSON shaping, media
  * decode) dwarfs the scan itself, stage parallelism is capped by the
  * INPUT's split count, not by the cluster: a one-row-group parquet
  * fixture or a gzipped drop arrives as ONE split and the whole
  * expensive stage runs on one core. The fix is an explicit repartition
  * before the expensive projection — but unconditionally, that exchange
  * is pure overhead on production inputs whose thousands of file splits
  * already saturate the cluster. So gate it on the PLANNED partition
  * count: if the frame already yields at least half the session's
  * shuffle width, this is the identity (zero plan change at 100 TB);
  * only narrow inputs pay the (raw-bytes-linear, by construction
  * negligible) shuffle.
  *
  * `df.rdd.getNumPartitions` materializes the physical plan but runs no
  * job — a few ms at query-construction time.
  */
object Rebalance {
  def scanWide(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(key) else df
  }
}
