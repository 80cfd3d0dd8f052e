package graft.sources.clustered

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.functions.ClusteredTable

/** THE CLUSTERED TABLE AS A FIRST-CLASS SPARK DATA SOURCE —
  * `spark.read.format("graft-clustered").option("root", …).load()` —
  * so the pruning every hand-written query in this repo performs
  * (envelope skip on the clustered dims, Bloom skip on an indexed key)
  * happens INSIDE the source, driven by the filters Catalyst pushes
  * down, invisible to the query author. Built on the stable v1
  * connector surface (`RelationProvider` + `PrunedFilteredScan`): the
  * optimizer hands `buildScan` the conjunctive filters and the pruned
  * column set; the relation translates what it can, decides the
  * z-bucket set, and returns a lazily-planned DataFrame's RDD — the
  * inner scan keeps every parquet-level win (partition pruning on
  * `zfile`, footer min/max, column pruning from the projection).
  *
  * Options: `root` (required); `d1`/`d2` name the clustered dimensions
  * (enables envelope pruning); `indexcol` names a Bloom-indexed long
  * key (enables point-lookup pruning through
  * [[ClusteredTable.indexCandidates]]). Semantics are exactly
  * [[ClusteredTable.read]]: merge-on-read deletes, the unfolded delta
  * tail (never pruned — `zfile = -1` rides every bucket decision),
  * schema evolution.
  *
  * Filter contract: translatable filters (=, <, <=, >, >=, IN, IS
  * [NOT] NULL on any column) are applied exactly inside the source and
  * reported handled; anything else is declared unhandled and Spark
  * re-applies it above the scan — pruning can therefore only ever
  * skip, never change, a result. A filter on d1/d2 additionally drives
  * the envelope decision; an =/IN on `indexcol` drives the Bloom
  * decision; the two prunes intersect.
  *
  * Scale: the envelope catalog is one ≤numFiles-row aggregate per scan
  * (the same driver-side collect every pruned query here pays); the
  * Bloom probe is a ≤numFiles-row collect + bitset tests. Both are
  * metadata-plane; data-plane cost is the kept buckets + the tail.
  */
class ClusteredSourceProvider extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-clustered"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-clustered requires option 'root'"))
    new ClusteredRelation(sqlContext, root,
      parameters.get("d1"), parameters.get("d2"), parameters.get("indexcol"))
  }
}

class ClusteredRelation(override val sqlContext: SQLContext, root: String,
    d1Col: Option[String], d2Col: Option[String], indexCol: Option[String])
  extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlContext.sparkSession
  private def full: DataFrame = ClusteredTable.read(spark, root)

  override val schema: StructType = full.schema

  /** Per-bucket (min d1, max d1, min d2, max d2) — ≤numFiles rows,
    * computed FROM THE SAME DataFrame instance the scan will return
    * rows from. Version consistency is the point: a cached catalog (or
    * a second `read()` listing) could describe a different fold than
    * the one scanned — bucket ids from v=K applied to v=K+1's files
    * silently drop in-box rows. Deriving both from one snapshot makes
    * the decision and the data share one file listing; that the
    * envelope aggregate then pays the snapshot's merge-on-read
    * anti-joins is the accepted price (pending DVs only SHRINK
    * envelopes, so pre-delete stats would be a sound over-approximation
    * — but they would come from a second, possibly different listing).
    */
  private def envelopesOf(snap: DataFrame): Seq[(Int, Int, Int, Int, Int)] =
    (d1Col, d2Col) match {
      case (Some(c1), Some(c2)) =>
        snap.filter(col("zfile") >= 0).groupBy("zfile")
          .agg(org.apache.spark.sql.functions.min(c1).cast("int").as("mn1"),
            org.apache.spark.sql.functions.max(c1).cast("int").as("mx1"),
            org.apache.spark.sql.functions.min(c2).cast("int").as("mn2"),
            org.apache.spark.sql.functions.max(c2).cast("int").as("mx2"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
          .toSeq
      case _ => Seq.empty
    }

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case _ => None
  }

  /** (lower, upper) bounds a conjunctive filter set implies for `c`. */
  private def bounds(filters: Array[Filter], c: String): (Long, Long) =
    filters.foldLeft((Long.MinValue, Long.MaxValue)) { case ((lo, hi), f) =>
      f match {
        case EqualTo(`c`, v) => asLong(v).map(x => (math.max(lo, x), math.min(hi, x))).getOrElse((lo, hi))
        case GreaterThan(`c`, v) => asLong(v).map(x => (math.max(lo, x + 1), hi)).getOrElse((lo, hi))
        case GreaterThanOrEqual(`c`, v) => asLong(v).map(x => (math.max(lo, x), hi)).getOrElse((lo, hi))
        case LessThan(`c`, v) => asLong(v).map(x => (lo, math.min(hi, x - 1))).getOrElse((lo, hi))
        case LessThanOrEqual(`c`, v) => asLong(v).map(x => (lo, math.min(hi, x))).getOrElse((lo, hi))
        case _ => (lo, hi)
      }
    }

  /** The z-bucket set the pushed filters allow: envelope-intersect on
    * the clustered dims, then intersect with the Bloom index's
    * candidates for an =/IN point lookup on `indexcol`. None = no
    * pruning decision possible (scan all buckets). Package-visible so
    * the spec can pin the decision itself, not just the row results.
    */
  private[graft] def plannedBuckets(filters: Array[Filter]): Option[Seq[Int]] =
    plannedBucketsOf(full, filters)

  private def plannedBucketsOf(snap: DataFrame,
      filters: Array[Filter]): Option[Seq[Int]] = {
    val envelopes = envelopesOf(snap)
    val box: Option[Seq[Int]] =
      if (envelopes.isEmpty) None
      else {
        val (lo1, hi1) = bounds(filters, d1Col.get)
        val (lo2, hi2) = bounds(filters, d2Col.get)
        if (lo1 == Long.MinValue && hi1 == Long.MaxValue &&
            lo2 == Long.MinValue && hi2 == Long.MaxValue) None
        else Some(envelopes.collect {
          case (zf, mn1, mx1, mn2, mx2)
            if mx1 >= lo1 && mn1 <= hi1 && mx2 >= lo2 && mn2 <= hi2 => zf
        })
      }
    val bloom: Option[Seq[Int]] = indexCol.flatMap { k =>
      val keys = filters.flatMap {
        case EqualTo(`k`, v) => asLong(v).toSeq
        case In(`k`, vs) => vs.toSeq.flatMap(asLong)
        case _ => Seq.empty
      }.distinct
      if (keys.isEmpty) None
      else ClusteredTable.indexCandidates(spark, root, k, keys.toSeq)
    }
    (box, bloom) match {
      case (Some(a), Some(b)) => Some(a.intersect(b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Exact Column for a translatable filter; None = unhandled. */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toSeq.map(lit): _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case _ => None
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => toColumn(f).isEmpty)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // ONE snapshot for the pruning decision and the returned rows —
    // the decision's bucket ids are only meaningful against the exact
    // fold they were computed from (see envelopesOf)
    val snap = full
    val pruned = plannedBucketsOf(snap, filters) match {
      // the unclustered tail (zfile = -1) rides every bucket decision
      case Some(keep) => snap.where(col("zfile") === -1 || col("zfile").isin(keep: _*))
      case None => snap
    }
    val filtered = filters.flatMap(toColumn).foldLeft(pruned)(_ where _)
    // an empty projection (count(*)) must yield zero-field rows — the
    // empty select does exactly that, so apply it unconditionally
    filtered.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}
