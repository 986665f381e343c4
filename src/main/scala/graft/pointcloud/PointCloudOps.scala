package graft.pointcloud

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial operators over point tables — the analysis layer the reference
  * leaves to downstream code, expressed as shuffle-lean Catalyst plans.
  */
object PointCloudOps {

  /** Voxel key for one axis: floor(value / size) as a long cell index. */
  def voxelKey(c: Column, size: Double): Column =
    floor(c.cast("double") / size).cast("long")

  /** Morton (Z-order) code over three int axes: each axis contributes its
    * top `bits` bits (sign-flipped so signed order maps to unsigned
    * order), interleaved x→bit 3i, y→3i+1, z→3i+2. Nearby points share
    * long code prefixes, so range-partitioning by this code clusters
    * space into files with tight bounding boxes. Pure bitwise column
    * arithmetic — whole-stage codegen, no UDF. */
  def mortonCode(x: Column, y: Column, z: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 21, "bits must be in [1, 21]")
    def prep(c: Column): Column =
      shiftrightunsigned(
        c.cast("int").bitwiseXOR(lit(Int.MinValue)).cast("long")
          .bitwiseAND(lit(0xffffffffL)),
        32 - bits)
    def spread(c: Column, off: Int): Seq[Column] =
      (0 until bits).map { i =>
        shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), 3 * i + off)
      }
    val (xs, ys, zs) = (prep(x), prep(y), prep(z))
    (spread(xs, 0) ++ spread(ys, 1) ++ spread(zs, 2)).reduce(_ bitwiseOR _)
  }

  /** Spatially cluster a point table into `nFiles` write tasks by Morton
    * range: each output file then covers a compact region, so its LAS
    * header bbox is tight and the scan-side file skip
    * ([[graft.pointcloud.connector.SectionSkip]]) prunes most files for
    * any selective spatial query. This is the layout half of the 100 TB
    * story — pushdown only pays when the data is laid out to match. */
  def clusterSpatially(df: DataFrame, xCol: String, yCol: String, zCol: String,
      nFiles: Int, bits: Int = 21): DataFrame = {
    val code = mortonCode(df(xCol), df(yCol), df(zCol), bits)
    df.withColumn("__morton", code)
      .repartitionByRange(nFiles, col("__morton"))
      .sortWithinPartitions("__morton")
      .drop("__morton")
  }

  /** Voxel-grid downsampling: one output row per occupied voxel with the
    * point count and the centroid of its members. A single hash-aggregate
    * shuffle on the (vx,vy,vz) key — the canonical 100 TB thinning plan
    * (map-side partial aggregation reduces each partition to its occupied
    * voxels before the exchange).
    */
  def voxelDownsample(df: DataFrame, xCol: String, yCol: String, zCol: String,
      voxelSize: Double): DataFrame =
    // centroids as ONE division of exact integer sums (LAS coordinates
    // are scaled ints), not avg(double): a float avg depends on the
    // partition-combine order, so its last ulp — and a ROUND at a
    // representation boundary — can differ per run/engine
    df.groupBy(
        voxelKey(col(xCol), voxelSize).as("vx"),
        voxelKey(col(yCol), voxelSize).as("vy"),
        voxelKey(col(zCol), voxelSize).as("vz"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col(xCol).cast("long")).cast("double") / count(lit(1))).as("cx"),
        (sum(col(yCol).cast("long")).cast("double") / count(lit(1))).as("cy"),
        (sum(col(zCol).cast("long")).cast("double") / count(lit(1))).as("cz"))

  /** Per-voxel covariance statistics — the local-structure foundation of
    * dimensionality-based point-cloud features (linearity / planarity /
    * scatter come from this matrix's eigenvalues; cf. the rendering
    * pipeline the reference cites, README.md:62-67). One hash-aggregate
    * shuffle; cov(a,b) = (Σab − Σa·Σb/n)/n computed from exact integer
    * sums. */
  def voxelCovariance(df: DataFrame, xCol: String, yCol: String, zCol: String,
      voxelSize: Double): DataFrame = {
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val z = col(zCol).cast("double")
    def cov(sab: Column, sa: Column, sb: Column, n: Column): Column =
      (sab - sa * sb / n) / n
    df.groupBy(
        voxelKey(col(xCol), voxelSize).as("vx"),
        voxelKey(col(yCol), voxelSize).as("vy"),
        voxelKey(col(zCol), voxelSize).as("vz"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(z * z).as("szz"),
        sum(x * y).as("sxy"), sum(x * z).as("sxz"), sum(y * z).as("syz"))
      .select(col("vx"), col("vy"), col("vz"), col("n"),
        cov(col("sxx"), col("sx"), col("sx"), col("n")).as("cxx"),
        cov(col("syy"), col("sy"), col("sy"), col("n")).as("cyy"),
        cov(col("szz"), col("sz"), col("sz"), col("n")).as("czz"),
        cov(col("sxy"), col("sx"), col("sy"), col("n")).as("cxy"),
        cov(col("sxz"), col("sx"), col("sz"), col("n")).as("cxz"),
        cov(col("syz"), col("sy"), col("sz"), col("n")).as("cyz"))
  }

  /** Radius neighbor join in the XY plane: pairs of points within
    * `radius`, found by joining on 3×3 adjacent grid cells of edge
    * `radius` (complete: two points within r always fall in the same or
    * adjacent cells), then exact distance filtering. One equi-join
    * shuffle on cell keys instead of a quadratic cross join.
    */
  def radiusJoin(df: DataFrame, idCol: String, xCol: String, yCol: String,
      radius: Double): DataFrame = {
    val pts = df.select(col(idCol).as("id"),
      col(xCol).cast("double").as("px"), col(yCol).cast("double").as("py"))
    // each point registers in its own cell; probes explode to 9 neighbors
    val home = pts
      .withColumn("cx", voxelKey(col("px"), radius))
      .withColumn("cy", voxelKey(col("py"), radius))
    val probes = home.select(col("id"), col("px"), col("py"),
        explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct((col("cx") + dx).as("nx"), (col("cy") + dy).as("ny")))): _*)).as("c"))
      .select(col("id"), col("px"), col("py"),
        col("c.nx").as("cx"), col("c.ny").as("cy"))
    val d2 = (col("a.px") - col("b.px")) * (col("a.px") - col("b.px")) +
      (col("a.py") - col("b.py")) * (col("a.py") - col("b.py"))
    probes.as("a")
      .join(home.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.id") < col("b.id") &&
          d2 <= radius * radius)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        sqrt(d2).as("dist"))
  }
}
