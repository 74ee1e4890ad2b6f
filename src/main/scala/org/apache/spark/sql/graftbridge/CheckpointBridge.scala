package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for `localCheckpoint()` blocks (VERDICT r9 #1).
  *
  * `Dataset.localCheckpoint()` caches the materialized partitions as RDD
  * blocks and truncates lineage, but Spark only frees those blocks when
  * the JVM garbage-collects the RDD handle — in a long-lived driver
  * (a bench loop, a continuously-ingesting pipeline) hundreds of
  * single-use checkpoints accumulate, inflate the block manager, and turn
  * into GC/eviction churn that shows up as multi-× slowdowns on later
  * work (the r9 `q_lake_ingest_neardup` 232 s pass2). These helpers free
  * the blocks deterministically the moment a pipeline is done with them.
  *
  * A checkpointed frame's plan root is a `LogicalRDD` holding the cached
  * RDD — `private[sql]`, hence this bridge (the ColumnBridge pattern).
  * Freeing walks ALL `LogicalRDD` leaves, so it also releases checkpoints
  * reachable only through a derived frame. Callers must only free frames
  * whose every consumer has already materialized: the lineage is
  * truncated, so a post-free action on a dependent frame fails loudly
  * (block-not-found) rather than silently recomputing stale data. */
object CheckpointBridge {

  /** Free the cached blocks behind each frame's `LogicalRDD` leaves.
    * Non-blocking; safe on frames that were never checkpointed (no-op). */
  def free(dfs: Dataset[_]*): Unit = dfs.foreach { df =>
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** Unpersist EVERY persisted RDD in the session — the between-queries
    * sweep for single-tenant drivers (Bench/Verify), where nothing may
    * legitimately survive a query boundary. NOT safe under concurrent
    * pipelines in other threads: it would free their in-flight
    * checkpoints (library code uses the targeted [[free]] instead). */
  def sweep(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
