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

  /** Voxel-grid downsampling: one output row per occupied voxel with the
    * point count and the centroid of its members. A single hash-aggregate
    * shuffle on the (vx,vy,vz) key — the canonical 100 TB thinning plan
    * (map-side partial aggregation reduces each partition to its occupied
    * voxels before the exchange).
    */
  def voxelDownsample(df: DataFrame, xCol: String, yCol: String, zCol: String,
      voxelSize: Double): DataFrame =
    df.groupBy(
        voxelKey(col(xCol), voxelSize).as("vx"),
        voxelKey(col(yCol), voxelSize).as("vy"),
        voxelKey(col(zCol), voxelSize).as("vz"))
      .agg(
        count(lit(1)).as("n"),
        avg(col(xCol).cast("double")).as("cx"),
        avg(col(yCol).cast("double")).as("cy"),
        avg(col(zCol).cast("double")).as("cz"))

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
