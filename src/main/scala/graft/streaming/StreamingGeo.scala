package graft.streaming

import graft.api.GeoDataFrame
import graft.geom.Wkb
import graft.join.{BroadcastTreeCache, SpatialJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming spatial operators — a beyond-reference capability
  * (GeoPandas is batch-only, SURVEY §2.12). Every `st_*` function is a
  * deterministic scalar column function, so plain transforms stream as-is;
  * this adds the two genuinely stateful/relational shapes:
  *
  *  - streaming sjoin: an unbounded stream of geometries joined against a
  *    STATIC layer (points-in-polygons enrichment). The static side is
  *    collected + broadcast once and probed per micro-batch via the same
  *    executor-cached STRtree the batch broadcast join uses — no shuffle of
  *    the stream, works in append mode.
  *  - windowed spatial aggregation: watermark + window + any graft
  *    aggregate (st_union_agg, total bounds, counts per cell).
  */
object StreamingGeo {

  /** Enrich a (possibly streaming) DataFrame with matches from a static
    * geometry layer. Returns one row per (stream row, matching static row);
    * rows with no match are kept with nulls when `keepUnmatched`. */
  def sjoinAgainstStatic(stream: DataFrame, static: GeoDataFrame,
                         predicate: String = "intersects",
                         streamGeom: String = "geometry",
                         keepUnmatched: Boolean = false,
                         broadcastThreshold: Long = 2000000L): DataFrame = {
    val spark = static.df.sparkSession
    val staticGeom = static.geometryCol
    // same guard as SpatialJoin: the static layer is collected + broadcast,
    // so an over-threshold layer must fail loudly, not OOM the driver.
    // limit(cap+1).count() short-circuits — no full count of a huge layer.
    if (broadcastThreshold >= 0) {
      val upTo = static.df.limit((broadcastThreshold + 1).min(Int.MaxValue - 1L).toInt).count()
      require(upTo <= broadcastThreshold,
        s"sjoinAgainstStatic broadcasts the static layer, which exceeds " +
        s"$broadcastThreshold rows; repartition-and-join the stream against " +
        s"it in batch, or raise broadcastThreshold if the driver can hold it")
    }
    // id assignment at the RDD level: monotonically_increasing_id() is
    // rejected by the streaming unsupported-operations checker even on the
    // batch side of a stream-static join
    val buildWithId = {
      val schema = static.df.schema.add("__graft_bid", org.apache.spark.sql.types.LongType)
      val rdd = static.df.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
      spark.createDataFrame(rdd, schema)
    }
    val rows = buildWithId.select(col("__graft_bid"), col(staticGeom))
      .na.drop(Seq(staticGeom)).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val bc = spark.sparkContext.broadcast(rows)
    val bcId = bc.id
    val pred = predicate

    val matchU = udf((g: Array[Byte]) => {
      if (g == null) Array.empty[Long]
      else {
        val idx = BroadcastTreeCache.get(bcId, bc.value)
        val geom = Wkb.read(g)
        val cands = idx.tree.query(geom.getEnvelopeInternal)
        val out = new scala.collection.mutable.ArrayBuffer[Long](4)
        var i = 0
        while (i < cands.size()) {
          val pos = cands.get(i).asInstanceOf[Integer].intValue()
          if (SpatialJoin.evalWithPrepared(pred, idx.prepared(pos), idx.geom(pos), geom,
            buildIsRight = true, distance = 0.0)) out += idx.ids(pos)
          i += 1
        }
        out.toArray
      }
    }).asNondeterministic() // stop Catalyst duplicating the tree probe

    val withMatches = stream.withColumn("__m", matchU(col(streamGeom)))
    val exploded =
      if (keepUnmatched)
        withMatches.select(col("*"), explode_outer(when(size(col("__m")) > 0, col("__m"))).as("__graft_bid"))
      else
        withMatches.select(col("*"), explode(col("__m")).as("__graft_bid"))
    exploded.drop("__m")
      .join(broadcast(buildWithId.drop(staticGeom)), Seq("__graft_bid"),
        if (keepUnmatched) "left" else "inner")
      .drop("__graft_bid")
  }

  /** Per-window, per-grid-cell aggregation of a streaming point set:
    * watermark + tumbling window + cell id from the geometry. */
  def windowedCellCounts(stream: DataFrame, tsCol: String, streamGeom: String,
                         cellSize: Double, windowLength: String,
                         watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.GeoFunctions.st_bounds
    stream
      .withWatermark(tsCol, watermark)
      .withColumn("__b", st_bounds(col(streamGeom)))
      .withColumn("cell_x", floor((col("__b.xmin") + col("__b.xmax")) / (2 * cellSize)))
      .withColumn("cell_y", floor((col("__b.ymin") + col("__b.ymax")) / (2 * cellSize)))
      .groupBy(window(col(tsCol), windowLength), col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n"))
  }
}
