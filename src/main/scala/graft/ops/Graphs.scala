package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over derived edge lists (EXT — SURVEY.md
  * §2h). The curation use-case: centrality as a quality/authority
  * signal over an entity co-occurrence graph (the link-graph-weighting
  * idea behind web-corpus quality scores), computed distributed with
  * the same iteration discipline as [[Dedup.resolveClusters]].
  */
object Graphs {

  /** INTEGER PageRank over an undirected simple graph, `iters` fixed
    * rounds — every step is integer arithmetic with explicit floor
    * semantics, so ranks are bit-identical on any engine (the float
    * formulation would drift across summation orders; SURVEY §7 "hard
    * parts" discipline):
    *
    *   rank₀(v)   = scale
    *   contrib(u) = rank(u) div outdeg(u)            (floor)
    *   rankᵢ(v)   = base + (Σ_{u→v} contrib(u)) * dampBp div 10000
    *   base       = scale * (10000 - dampBp) div 10000
    *
    * The symmetric closure means every node has outdeg ≥ 1 (no dangling
    * mass) and appears as a destination every round. Fixed iteration
    * count, not convergence: exactness is the contract here; callers
    * wanting a tolerance loop can compare successive rounds themselves.
    *
    * Scale: the contribution table is |V|-sized (the entity vocabulary —
    * parts, domains, hosts) while edges are corpus-derived (|E| ≫ |V|),
    * so each round BROADCASTS contrib and the cached edge table never
    * shuffles for the join — without the hint Spark sort-merge-joined
    * |E| rows per round (measured 11 s for 10 rounds over 1.7 M edges at
    * sf0.1; broadcast cut it to ~3.5 s). The only per-round exchange is
    * the partial-aggregated contribution sum (map-side combine reduces
    * it to ≤ |V| rows per map partition); re-attaching outdeg is a
    * |V| ⋈ |V| join AQE broadcasts on its own. Lineage is truncated per
    * round (localCheckpoint) exactly like resolveClusters. If |V| ever
    * exceeds broadcast limits (hundreds of millions of entities), drop
    * the hint and co-partition edges and state by src instead. Rank
    * magnitudes are bounded by scale · |V| (conservation up to floors),
    * far from BIGINT range.
    */
  def pagerankInt(edges: DataFrame, a: String = "da", b: String = "db",
      iters: Int = 10, scale: Long = 10000L, dampBp: Long = 8500L): DataFrame = {
    require(iters >= 1 && dampBp >= 0 && dampBp <= 10000,
      s"iters >= 1 and dampBp in [0,10000]; got $iters, $dampBp")
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = scale * (10000L - dampBp) / 10000L
    // state carries outdeg so each round's contribution is a map-side
    // projection of the |V|-sized state, never an edge-sized join
    var state = deg.select(col("src").as("node"), lit(scale).as("rank"),
      col("outdeg")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = state.select(col("node").as("src"),
        expr("rank div outdeg").as("c"))
      val sums = sym.join(broadcast(contrib), "src")
        .groupBy(col("dst").as("node"))
        .agg(expr(s"CAST($base AS BIGINT) + sum(c) * $dampBp div 10000")
          .as("rank"))
      state = sums
        .join(broadcast(deg.withColumnRenamed("src", "node")), "node")
        .localCheckpoint()
      i += 1
    }
    // state is localCheckpoint'ed (materialized), so both caches can be
    // released before returning — repeated calls must not leak blocks
    sym.unpersist()
    deg.unpersist()
    state.select("node", "rank").orderBy("node")
  }
}
