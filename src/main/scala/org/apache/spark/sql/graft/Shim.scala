package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]`/`private[spark]` surface — the same
  * shim every Spark connector library carries: Column <-> Expression
  * conversion, plus the broadcast-once Hadoop-conf wrapper Spark's own
  * sources use (serialized once per query, fetched per executor —
  * never shipped whole inside every task's closure). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def broadcastConf(
      sc: org.apache.spark.SparkContext,
      conf: org.apache.hadoop.conf.Configuration): ConfBroadcast =
    new ConfBroadcast(
      org.apache.spark.util.SerializableConfiguration.broadcast(sc, conf))
}

/** Opaque, serializable handle on a broadcast Hadoop conf — the
  * `private[spark]` SerializableConfiguration type never leaks into
  * library signatures. */
final class ConfBroadcast private[graft] (
    bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
  extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = bc.value.value
}
