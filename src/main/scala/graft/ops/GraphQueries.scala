package graft.ops

import graft.{Fns, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationally-derived edge lists — the
  * second graph operator family beside q71's connected components
  * (llm/DedupQueries.scala). The reference has no graph surface; this is
  * north-star extension territory (SURVEY.md §2.3): a training-data
  * pipeline ranks documents/hosts by link centrality (PageRank over the
  * web graph is literally how quality weights for pretraining corpora are
  * derived — Brin & Page 1998).
  *
  * Scale shape (the q71/q90 lessons applied): the edge list is computed
  * once, repartitioned on its join key, and localCheckpointed so every
  * iteration's join is co-partitioned and plan depth stays bounded at any
  * iteration count; each iteration is exactly one join + one aggregation
  * (rank state is (node, rank) pairs — nodes-sized, never edges-sized).
  * Per-edge rank contributions sum through the scale-18 exact-decimal
  * [[Fns.dsum18]] (contributions sit at 1e-6..1e-9), so the rank vector
  * is bit-identical in both engines and the oracle can state the
  * iterations as unrolled CTEs.
  */
object GraphQueries extends QueryModule {

  /** Damping 0.85, fixed-iteration PageRank on an undirected edge list.
    * `edges` must already carry both directions; nodes are the edge
    * endpoints (a node with no transactions has no rank — documented).
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // The checkpointed edge list carries each source's out-degree folded
    // in ONCE (the degree aggregation rides the same src partitioning —
    // no extra exchange), so a propagation round never recomputes it.
    // Rounds then cost exactly one shuffle each: the e-side of the join
    // reads the checkpoint's src partitioning, the rank side arrives
    // already partitioned on the node key from the previous round's
    // aggregation, and only the groupBy(dst) moves data. Superseded rank
    // frames and finally the edge list free via Checkpoints (bounded
    // storage at any iteration count).
    val e0 = edges.repartition(col("src"))
    // The out-degree folds in via a count window OVER THE SAME src
    // partitioning the repartition just established — no aggregation
    // branch, no join, no second pass: the edge build (often a join +
    // distinct upstream) runs exactly ONCE, inside this one checkpoint
    // materialization. (The previous shape checkpointed a separate
    // degree frame and joined it back — each checkpoint re-ran the
    // whole edge build, doubling the dominant cost.) Serialized
    // storage: the edge list is the one corpus-scale cache — one byte
    // array per block instead of millions of row objects keeps it
    // invisible to GC tracing while it lives across rounds.
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val e = e0
      .select(col("src"), col("dst"), count(lit(1)).over(wSrc).as("outdeg"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // node set + count read the checkpoint, not the edge build; the
    // hash(src) partitioning survives the checkpoint, so the distinct
    // needs no exchange (one row per src survives in place, and the
    // undirected edge list guarantees every node appears as a src)
    val nodes = e.select(col("src")).distinct()
    val nN = nodes.agg(count(lit(1)).as("n_nodes"))
    val r0 = nodes.select(col("src").as("node")).crossJoin(broadcast(nN))
      .select(col("node"),
        (lit(1.0) / col("n_nodes").cast("double")).as("pr"),
        col("n_nodes"))
    def step(r: DataFrame): DataFrame =
      e.join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("n_nodes"),
          (col("pr") / col("outdeg").cast("double")).as("contrib"))
        .groupBy(col("node"))
        .agg(Fns.dsum18(col("contrib")).as("inflow"),
          max(col("n_nodes")).as("n_nodes"))
        .select(col("node"),
          (lit(0.15) / col("n_nodes").cast("double") +
            lit(0.85) * col("inflow")).as("pr"),
          col("n_nodes"))
    // >= 1 iteration: the final rank frame must be a checkpoint that no
    // longer references the edge list, or freeing it below would tear
    // blocks out from under the returned (lazy) plan
    require(iters >= 1, s"pagerank needs at least one iteration, got $iters")
    var r = r0
    var it = 0
    while (it < iters) {
      r = graft.Checkpoints.roll(step(r), r)
      it += 1
    }
    graft.Checkpoints.free(e)
    r.select(col("node"), col("pr"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two PageRank iterations over the undirected customer–supplier
    // co-transaction graph (suppliers offset by 1e6 into a shared id
    // space). The fixture stands in for the host/link graph of a crawl;
    // the plan is identical at web scale because rank state is
    // nodes-sized and each iteration is one co-partitioned join.
    "q107_pagerank" -> { (s, dir) =>
      val off = lit(1000000L)
      val e0 = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + off).as("dst"))
        .distinct()
      // both directions via one explode — the self-union spelling
      // re-runs the distinct's final aggregation per branch (only the
      // exchange is reused); bipartite ids (suppliers offset) mean no
      // self-loops, so the exploded list stays duplicate-free
      val edges = e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      pagerank(edges, 2).orderBy("node")
    },

    // Per-node triangle participation on the mutual-kNN graph (q129's
    // edge set) — the local clustering signal graph-based curation uses
    // to separate tight semantic clusters (high triangle count = dense
    // near-dup neighborhoods worth one survivor) from bridge nodes.
    // Plan: edges arrive oriented (a_id < b_id), so each triangle
    // a<b<c is found exactly once by composing (a,b)+(b,c) wedges and
    // closing with an (a,c) edge — the standard oriented-triangle join
    // that never double-counts and bounds wedge fan-out by the forward
    // degree. Scale shape: mutual-kNN degree is <= k by construction, so
    // the edge list is n*k-sized, wedges are n*k^2-bounded (corpus-
    // LINEAR, never pair-quadratic), and all three joins carry the label
    // block key. The edge list materializes once (localCheckpoint) —
    // three self-join branches would otherwise re-run the kNN window
    // per branch (Spark plans have no subtree sharing).
    "q147_triangle_count" -> { (s, dir) =>
      triangleCounts(graft.llm.SimilarityQueries
        .mutualKnnEdges(Tables.t(s, dir, "embeddings"), 5)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "vec_id")
    },

    // k-core of the mutual-kNN graph (Seidman 1983): iteratively peel
    // nodes with degree < k until the maximal subgraph where everyone
    // keeps >= k neighbors remains — the density filter past q147's
    // triangles (a triangle needs 3 mutual friends ONCE; a 3-core node
    // keeps 3 inside the surviving subgraph, transitively). In corpus
    // terms: the embedding neighborhoods dense enough to trust for
    // semantic dedup or cluster seeding, with hub-noise and fringe
    // vectors peeled away. The fixpoint is unique (peeling order never
    // changes the maximal k-core), so the oracle can state it as
    // unrolled rounds — any unroll depth >= the convergence round gives
    // the same table.
    "q170_kcore" -> { (s, dir) =>
      kCore(graft.llm.SimilarityQueries
        .mutualKnnEdges(Tables.t(s, dir, "embeddings"), 5)
        .select(col("label"), col("a_id"), col("b_id")), 3)
        .orderBy("label", "vec_id")
    },

    // Single-source BFS hop distances over the q107 co-transaction
    // graph, seeded at the smallest node id — the reachability /
    // radius primitive (crawl-frontier depth, link-distance-from-seed
    // quality signals) that completes the graph family alongside rank,
    // triangles, cores, and components. Frontier-delta iteration: each
    // round expands ONLY the nodes discovered last round against the
    // once-checkpointed edge list (co-partitioned join), anti-joins the
    // known set to keep the state nodes-sized, and rolls the checkpoint
    // so storage stays bounded at any hop count. Four hops cover the
    // fixture's bipartite diameter; unreached nodes are absent (a
    // reachability readout, not an error).
    "q201_bfs_hops" -> { (s, dir) =>
      val off = lit(1000000L)
      val e0 = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + off).as("dst"))
        .distinct()
      val edges = e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      bfsHops(edges, 4).orderBy("node")
    },

    // Link prediction on the mutual-kNN graph: score NON-edges by
    // common-neighbor count and Adamic-Adar (Σ 1/ln deg(b) over shared
    // neighbors b — rare shared neighbors weigh more), the classic
    // local-similarity predictors for "these two documents should be
    // connected" (missing near-dup pairs, retrieval candidates). Same
    // wedge machinery as q147's triangles, pointed at the OPEN wedges:
    // compose adjacency with itself (fan-out ≤ k² per node — corpus-
    // linear by the mutual-kNN degree bound), drop pairs already
    // joined by an edge (co-keyed anti-join), aggregate per candidate
    // pair. Wedge centers have degree ≥ 2, so ln(deg) never hits zero;
    // the AA sum rides the scale-18 exact-decimal carry.
    "q214_link_prediction" -> { (s, dir) =>
      linkPrediction(graft.llm.SimilarityQueries
        .mutualKnnEdges(Tables.t(s, dir, "embeddings"), 5)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "x", "y")
    },

    // Local clustering coefficient per node on the mutual-kNN graph —
    // Watts-Strogatz C(v) = 2T(v) / (deg(v)·(deg(v)−1)): the per-node
    // density readout that separates tight near-dup neighborhoods
    // (C → 1: neighbors all know each other — one survivor suffices)
    // from hub/bridge nodes (C → 0) — the node-level refinement of
    // q147's raw triangle counts. Plan: ONE checkpointed edge list
    // feeds both the degree aggregation (explode both endpoints, count)
    // and the oriented-triangle join; the left join fills triangle-free
    // nodes with 0. Scale shape inherits q147's: degree ≤ k by
    // construction, so edges are n·k-sized and wedges n·k²-bounded —
    // corpus-linear. The coefficient is one IEEE division of exact
    // integers, rounded at 6 with the -0.0 fold.
    "q225_clustering_coefficient" -> { (s, dir) =>
      clusteringCoefficients(graft.llm.SimilarityQueries
        .mutualKnnEdges(Tables.t(s, dir, "embeddings"), 5)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "vec_id")
    },

    // Degree assortativity (Newman 2002) per label block: the Pearson
    // correlation of endpoint degrees over the directed edge list — does
    // this similarity graph wire hubs to hubs (assortative, r > 0:
    // dense semantic cores) or hubs to leaves (disassortative, r < 0:
    // hub-and-spoke boilerplate patterns)? One number per block, the
    // graph-topology drift signal to monitor across corpus versions.
    // Plan: degrees from one aggregation over the exploded adjacency,
    // joined back onto both endpoints of each directed edge (both joins
    // co-keyed on the node), then a single moment aggregation. All five
    // moments are sums of bounded integer products (deg ≤ k), so the
    // sums are exact longs and r is one double expression over them,
    // identical bits in both engines; a zero-variance block yields NULL
    // (no correlation is defined there), stated with the same CASE in
    // the oracle.
    "q230_degree_assortativity" -> { (s, dir) =>
      assortativityOf(graft.llm.SimilarityQueries
        .mutualKnnEdges(Tables.t(s, dir, "embeddings"), 5)
        .select(col("label"), col("a_id"), col("b_id"))
        .transform(graft.Checkpoints.ckpt))
    },

    // The PRODUCTION assortativity: identical moments, but the edge
    // frame comes from the declared scaled-k build (q244's k=⌈√N⌉
    // k-means cells — N^1.5 candidates) instead of the exact all-pairs
    // twin whose 20× point measures 30× (SCALE_PROOF.md). This is the
    // consumer-takes-the-edge-frame contract exercised END TO END with
    // an oracle: at 100 TB the q230 readout runs on exactly this plan.
    "q252_assortativity_scaledk" -> { (s, dir) =>
      val emb = Tables.t(s, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      assortativityOf(graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id"))
        .transform(graft.Checkpoints.ckpt))
    },

    // The PRODUCTION k-core: q170's peel, but the edge frame is q244's
    // scaled-k build (k=⌈√N⌉ k-means cells — N^1.5 candidates) instead
    // of the exact all-pairs twin (30× at 20×, SCALE_PROOF.md). With
    // q252/q272 this retires the last weak-for-scale flag: every
    // declared graph consumer now runs on the edge plan you'd run at
    // 100×. Core order 2, not q170's 3: the IVF-probed mutual graph is
    // sparser than the exact twin and its 3-core is EMPTY at sf0.01/0.1
    // (ProbeKcoreRounds measured 0 survivors) — a vacuously-green
    // contract; the 2-core survives at every scale (28 @ sf0.01 …
    // 52963 @ 20×, fixpoint ≤ 7 rounds, inside the oracle's 10-round
    // unroll). Same unique-fixpoint argument as q170, so the oracle
    // unrolls the peel over q244's own oracle CTE.
    "q271_kcore_scaledk" -> { (s, dir) =>
      val emb = Tables.t(s, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      kCore(graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id")), 2)
        .orderBy("label", "vec_id")
    },

    // The PRODUCTION link prediction: q214's common-neighbor +
    // Adamic-Adar kernel over q244's scaled-k edges — the heaviest
    // graph consumer (k² wedge fan-out) exercised end to end on the
    // plan that survives 100× instead of the exact quadratic build.
    "q272_linkpred_scaledk" -> { (s, dir) =>
      val emb = Tables.t(s, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      linkPrediction(graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "x", "y")
    },

    // The PRODUCTION triangle participation: q147's oriented-triangle
    // kernel over q244's scaled-k edge frame (k = ⌈√N⌉ k-means cells,
    // N^1.5 candidates) — with q284 this retires the LAST two declared
    // consumers of the exact all-pairs edge build (30× at 20×,
    // SCALE_PROOF.md): every graph operator now has a declared row on
    // the edge plan you'd run at 100×.
    "q283_triangles_scaledk" -> { (s, dir) =>
      val emb = Tables.t(s, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      triangleCounts(graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "vec_id")
    },

    // The PRODUCTION clustering coefficient: q225's C(v) assembly over
    // q244's scaled-k edges — see q283.
    "q284_clustering_scaledk" -> { (s, dir) =>
      val emb = Tables.t(s, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      clusteringCoefficients(graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id")))
        .orderBy("label", "vec_id")
    },

    // HITS hubs/authorities (Kleinberg 1999, two mutually-recursive
    // power iterations) on the directed customer→part purchase
    // bipartite graph — the "which buyers are tastemakers / which
    // products anchor the catalog" readout, and on a crawl graph the
    // classic page-quality prior next to q107's PageRank. Two full
    // h←Σa / a←Σh rounds, each side L1-normalized through a broadcast
    // 1-row total so the scores are scale-free. Plan shape: rank state
    // is nodes-sized, each half-step is ONE edges×state join + one
    // aggregation on the edge key (the q107 shape); normalization
    // totals ride [[Fns.dsum18]] exact-decimal sums so both engines
    // divide identical doubles and the oracle unrolls the same CTEs.
    // Fixed two iterations keeps the plan tree bounded without
    // checkpoint rolls.
    "q246_hits" -> { (s, dir) =>
      val e0 = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
      // TWO co-partitioned edge materializations (r15, guide §2.4):
      // hub steps join on dst, auth steps on src — a single checkpoint
      // carrying the distinct's (src, dst) partitioning forced a full
      // edge exchange inside EVERY half-step. Partitioned on each join
      // key (the localCheckpoint preserves output partitioning, the
      // q292/q201 recipe), each half-step join is co-partitioned with
      // the state frame's groupBy output and moves no edge bytes; the
      // dst copy is one exchange over the src checkpoint, not a re-run
      // of the join+distinct.
      val eBySrc = e0.repartition(col("src"))
        .transform(graft.Checkpoints.ckpt)
      val eByDst = eBySrc.repartition(col("dst"))
        .transform(graft.Checkpoints.ckpt)
      def normalized(raw: DataFrame): DataFrame = {
        // materialize each half-step ONCE (r14): `raw` is referenced
        // twice (the L1 total and the division) and every half-step
        // feeds the next, so the lazy spelling re-evaluated the
        // e⋈state join+agg per reference — compounding across the four
        // half-steps (h2 sits inside a2 AND the final union). One
        // nodes-sized checkpoint per half-step bounds the re-evaluation
        // at one execution per step. The L1 total collects to the
        // driver (r15) — dsum18 already returns a double, so dividing
        // by the literal is the identical IEEE operation, without the
        // per-half-step broadcast-exchange machinery.
        val r = raw.transform(graft.Checkpoints.ckpt)
        val tot = r.agg(Fns.dsum18(col("raw")).as("tot")).head().getDouble(0)
        r.select(col("node"), (col("raw") / lit(tot)).as("score"))
      }
      def hubStep(auth: DataFrame): DataFrame = normalized(
        eByDst.join(auth.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node"))
          .agg(Fns.dsum18(col("score")).as("raw")))
      def authStep(hub: DataFrame): DataFrame = normalized(
        eBySrc.join(hub.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(Fns.dsum18(col("score")).as("raw")))
      val a0 = eByDst.select(col("dst").as("node")).distinct()
        .select(col("node"), lit(1.0).as("score"))
      val h1 = hubStep(a0); val a1 = authStep(h1)
      val h2 = hubStep(a1); val a2 = authStep(h2)
      h2.select(lit("hub").as("kind"), col("node"),
          (round(col("score"), 6) + lit(0.0)).as("score"))
        .unionAll(a2.select(lit("auth").as("kind"), col("node"),
          (round(col("score"), 6) + lit(0.0)).as("score")))
        .orderBy("kind", "node")
    },

    // Weighted single-source shortest paths (Bellman-Ford) on the
    // customer–supplier co-transaction graph — q201's BFS asks "how many
    // hops", this asks "how CLOSE": edge weight 1/cnt (cnt = co-occurring
    // order lines), so heavily-transacting pairs are near and the
    // distance field is the relationship-strength radius crawl-frontier
    // prioritization and influence attribution actually want (hop counts
    // treat a 1-order and a 500-order link identically). 8 relaxation
    // rounds cover the fixture's weighted diameter with margin
    // (ProbeSsspRounds: fixpoint at 4–5 rounds at sf0.001/0.01/0.1 and
    // 10×/20×, flat in scale because the bipartite hop diameter is 4 and
    // extra rounds only reroute through lighter multi-hop detours); the
    // oracle unrolls 9 and guards round 8 = round 9, so growth past the
    // unroll fails loudly. Distances stay bit-identical across engines:
    // MIN is order-independent and each round's candidate is one IEEE
    // add on the previous round's stored double (see weightedSssp).
    "q292_weighted_sssp" -> { (s, dir) =>
      val off = lit(1000000L)
      val pair = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + off).as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"),
          (lit(1.0) / col("cnt").cast("double")).as("w"))
      val edges = pair.select(explode(array(
          struct(col("src"), col("dst"), col("w")),
          struct(col("dst").as("src"), col("src").as("dst"), col("w"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.w").as("w"))
      weightedSssp(edges, 8)
        .select(col("node"),
          (round(col("dist"), 6) + lit(0.0)).as("dist"))
        .orderBy("node")
    })

  /** Fixed-depth single-source BFS from the smallest node id of an
    * undirected edge list (both directions present). Returns (node,
    * dist) for every node within `maxHops`; min-hop semantics fall out
    * of the frontier construction (a node joins `known` the first round
    * it is reached and is anti-joined away afterwards). One checkpoint
    * rolls per round, the edge list materializes once — the q107/q71
    * iterative shape.
    */
  /** Newman degree assortativity per label block over an undirected edge
    * list (label, a_id, b_id) — the consumer half shared by q230 (exact
    * edge twin) and q252 (scaled-k production edges). Degrees from one
    * aggregation over the exploded adjacency, joined back onto both
    * endpoints (both joins node-co-keyed), one moment aggregation; all
    * five moments are exact-long sums of bounded integer products
    * (deg ≤ k), so r is one double expression with identical bits in
    * both engines. Zero-variance blocks yield NULL.
    */
  def assortativityOf(e: DataFrame): DataFrame = {
    val adj = e.select(col("label"), explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("p"))
      .select(col("label"), col("p.src").as("src"), col("p.dst").as("dst"))
    val deg = adj.groupBy(col("label"), col("src"))
      .agg(count(lit(1)).as("deg"))
    val xy = adj
      .join(deg.select(col("label"), col("src"), col("deg").as("dx")),
        Seq("label", "src"))
      .join(deg.select(col("label"), col("src").as("dst"),
        col("deg").as("dy")), Seq("label", "dst"))
    val m = xy.groupBy(col("label"))
      .agg(count(lit(1)).as("n_edges"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    val num = col("n_edges") * col("sxy") - col("sx") * col("sy")
    val vx = col("n_edges") * col("sxx") - col("sx") * col("sx")
    val vy = col("n_edges") * col("syy") - col("sy") * col("sy")
    m.select(col("label"), col("n_edges"),
        when(vx > 0 && vy > 0,
          round(num.cast("double") /
            sqrt(vx.cast("double") * vy.cast("double")), 6) + lit(0.0))
          .as("assortativity"))
      .orderBy("label")
  }

  def bfsHops(edges: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.repartition(col("src")).localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var known = e.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0).as("dist"))
    var h = 1
    while (h <= maxHops) {
      val frontier = known.filter(col("dist") === h - 1)
      val newNodes = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(known, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
      known = graft.Checkpoints.roll(known.unionByName(newNodes), known)
      h += 1
    }
    graft.Checkpoints.free(e)
    known
  }

  /** Fixed-round Bellman-Ford single-source shortest paths from the
    * smallest node id of a WEIGHTED undirected edge list (src, dst, w;
    * both directions present, w > 0). Round r relaxes every edge once:
    * d_r(v) = min(d_{r-1}(v), min over (u,v) of d_{r-1}(u) + w(u,v)) —
    * state stays nodes-sized (never paths-sized: the naive recursive
    * path enumeration is exponential in the round count where this is
    * one edges×state join + one group-min per round). MIN is
    * order-independent and each round adds exactly one edge weight to
    * the stored previous-round double, so the distance vector is
    * bit-identical to the oracle's unrolled CTEs at the same depth —
    * no decimal carry needed (contrast the SUM-shaped kernels). The
    * edge list materializes once (repartitioned on the probe key);
    * each round rolls one checkpoint, the q107/q71 iterative shape —
    * and here the roll is not just lineage hygiene but the measured
    * winner: each round references the state frame TWICE (carry-over
    * union + relaxation join), so an un-checkpointed 8-round DAG
    * doubles the state subtree per round and ran 2.8× slower
    * (ProbeSsspShape: 17.5 s vs 6.3 s at sf0.1).
    * Callers pick `rounds` >= the fixpoint round (probed per fixture);
    * the oracle's trailing guard round turns an insufficient depth
    * into a loud zero-row failure instead of a silent mid-relaxation
    * snapshot.
    */
  def weightedSssp(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"weightedSssp needs at least one round, got $rounds")
    val e = edges.repartition(col("src")).localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var d = e.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0.0).as("dist"))
    var r = 0
    while (r < rounds) {
      val relaxed = e
        .join(d.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      d = graft.Checkpoints.roll(
        d.unionByName(relaxed).groupBy(col("node"))
          .agg(min(col("dist")).as("dist")), d)
      r += 1
    }
    graft.Checkpoints.free(e)
    d
  }

  /** Per-node triangle participation counts over an undirected,
    * label-blocked edge list given in canonical orientation (a_id <
    * b_id, one row per edge). Composes (a,b)+(b,c) wedges and closes on
    * (a,c), so each triangle a<b<c is found exactly once; the input
    * materializes once (localCheckpoint) because the three join branches
    * would otherwise re-run the whole edge build. Returns (label,
    * vec_id, n_triangles) for nodes in at least one triangle, unsorted
    * (callers add their presentation ORDER BY).
    */
  /** Common-neighbor + Adamic-Adar scoring of non-edges over any
    * oriented mutual edge list (label, a_id, b_id) — q214's kernel,
    * parameterized on the edge builder so the exact (label-blocked
    * all-pairs, oracle-checkable) and scaled-k (IVF-probed, production)
    * kNN graphs run the identical downstream plan. */
  def linkPrediction(edges: DataFrame): DataFrame = {
    val e = edges.transform(graft.Checkpoints.ckpt)
    val adj = e.select(col("label"), explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("p"))
      .select(col("label"), col("p.src").as("src"), col("p.dst").as("dst"))
    val deg = adj.groupBy(col("label"), col("src"))
      .agg(count(lit(1)).as("deg"))
    adj.select(col("label"), col("dst").as("x"), col("src").as("b"))
      .join(adj.select(col("label"), col("src").as("b"),
        col("dst").as("y")), Seq("label", "b"))
      .filter(col("x") < col("y"))
      .join(e.select(col("label"), col("a_id").as("x"),
        col("b_id").as("y")), Seq("label", "x", "y"), "left_anti")
      .join(deg.select(col("label"), col("src").as("b"), col("deg")),
        Seq("label", "b"))
      .groupBy(col("label"), col("x"), col("y"))
      .agg(count(lit(1)).as("common_neighbors"),
        Fns.dsum18(lit(1.0) / log(col("deg").cast("double"))).as("aa"))
      .filter(col("common_neighbors") >= 2)
      .select(col("label"), col("x"), col("y"),
        col("common_neighbors"),
        (round(col("aa"), 6) + lit(0.0)).as("adamic_adar"))
  }

  /** Watts-Strogatz local clustering coefficient per node — q225's
    * assembly, parameterized on the edge builder (the q214/q271 recipe)
    * so the exact twin (q225) and the scaled-k production edges (q284)
    * run the identical downstream plan: ONE checkpointed edge list feeds
    * both the degree aggregation and the oriented-triangle join; the
    * left join fills triangle-free nodes with 0; C(v) is one IEEE
    * division of exact integers, rounded at 6 with the -0.0 fold.
    * Unsorted — callers add their presentation ORDER BY.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges.transform(graft.Checkpoints.ckpt)
    val deg = e.select(col("label"),
        explode(array(col("a_id"), col("b_id"))).as("vec_id"))
      .groupBy(col("label"), col("vec_id"))
      .agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(e)
    deg.join(tri, Seq("label", "vec_id"), "left")
      .select(col("label"), col("vec_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
              .cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6)
            + lit(0.0))
          .otherwise(lit(0.0)).as("clustering"))
  }

  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.transform(graft.Checkpoints.ckpt)
    val e1 = e.select(col("label"), col("a_id").as("a"),
      col("b_id").as("b"))
    val e2 = e.select(col("label"), col("a_id").as("b"),
      col("b_id").as("c"))
    val e3 = e.select(col("label"), col("a_id").as("a"),
      col("b_id").as("c"))
    e1.join(e2, Seq("label", "b")).join(e3, Seq("label", "a", "c"))
      .select(col("label"),
        explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy(col("label"), col("vec_id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Iterative k-core peel over a label-blocked undirected edge list in
    * canonical orientation (a_id < b_id). Each round drops every node
    * whose CURRENT degree is < k and keeps only edges with both
    * endpoints surviving; converges when a round removes no edge.
    * Returns (label, vec_id, core_deg) for the survivors — core_deg is
    * the within-core degree, >= k by construction.
    *
    * Scale shape (the q71 loop recipe): the symmetrized adjacency
    * materializes once per round via Checkpoints.roll (superseded rounds
    * freed), each round costs one degree aggregation plus two
    * co-keyed semi-joins — all edges/nodes-sized, never pair-quadratic —
    * and convergence rides an `observe` metric on the round's own
    * materialization, so each round is exactly one action. Peeling can
    * take O(diameter) rounds on pathological chains; maxIter fails loudly
    * rather than returning a mid-peel superset.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    var adj = edges.select(col("label"), explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
      .select(col("label"), col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("label"), col("src"))
      .transform(graft.Checkpoints.ckpt)
    var prev = -1L
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val keep = adj.groupBy(col("label"), col("src"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("label"), col("src"))
      val next = adj
        .join(keep, Seq("label", "src"), "left_semi")
        .join(keep.select(col("label"), col("src").as("dst")),
          Seq("label", "dst"), "left_semi")
        .select(col("label"), col("src"), col("dst"))
      val obs = new org.apache.spark.sql.Observation(s"kcore_$iter")
      adj = graft.Checkpoints.roll(
        next.observe(obs, count(lit(1)).as("n_edges")), adj)
      val n = obs.get("n_edges").asInstanceOf[Long]
      converged = n == prev
      prev = n
      iter += 1
    }
    require(converged, s"kCore did not converge in $maxIter rounds")
    adj.groupBy(col("label"), col("src").as("vec_id"))
      .agg(count(lit(1)).as("core_deg"))
  }

  override def oracles: Map[String, String] = Map(
    // the iterations unrolled as CTEs (the q90 recipe): each rank update
    // is the same fixed expression tree over the same exact-decimal sums
    "q107_pagerank" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_nodes FROM deg),
         |r0 AS (
         |  SELECT src AS node, 1.0 / CAST(n_nodes AS DOUBLE) AS pr
         |  FROM deg CROSS JOIN n),
         |r1 AS (
         |  SELECT e.dst AS node,
         |    0.15 / CAST(MAX(n.n_nodes) AS DOUBLE) + 0.85 *
         |      ${Fns.dsum18Sql("r0.pr / CAST(deg.outdeg AS DOUBLE)")}
         |      AS pr
         |  FROM e JOIN r0 ON r0.node = e.src
         |    JOIN deg ON deg.src = e.src CROSS JOIN n
         |  GROUP BY e.dst),
         |r2 AS (
         |  SELECT e.dst AS node,
         |    0.15 / CAST(MAX(n.n_nodes) AS DOUBLE) + 0.85 *
         |      ${Fns.dsum18Sql("r1.pr / CAST(deg.outdeg AS DOUBLE)")}
         |      AS pr
         |  FROM e JOIN r1 ON r1.node = e.src
         |    JOIN deg ON deg.src = e.src CROSS JOIN n
         |  GROUP BY e.dst)
         |SELECT node, pr FROM r2 ORDER BY node""".stripMargin,

    // q129's mutual-kNN CTE chain, then the same oriented-triangle join
    "q147_triangle_count" ->
      """WITH e AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |    LIST_COSINE_SIMILARITY(a.v, b.v) AS cos
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT label, a_id, b_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY a_id
        |                       ORDER BY cos DESC, b_id ASC) AS rnk
        |  FROM s),
        |knn AS (SELECT label, a_id, b_id FROM r WHERE rnk <= 5),
        |mu AS (
        |  SELECT k.label, k.a_id, k.b_id
        |  FROM knn k JOIN knn m
        |    ON k.label = m.label AND k.a_id = m.b_id AND k.b_id = m.a_id
        |  WHERE k.a_id < k.b_id),
        |tri AS (
        |  SELECT e1.label, e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
        |  FROM mu e1
        |  JOIN mu e2 ON e1.label = e2.label AND e2.a_id = e1.b_id
        |  JOIN mu e3 ON e3.label = e1.label AND e3.a_id = e1.a_id
        |    AND e3.b_id = e2.b_id),
        |n AS (SELECT label, UNNEST([a, b, c]) AS vec_id FROM tri)
        |SELECT label, vec_id, COUNT(*) AS n_triangles
        |FROM n GROUP BY 1, 2 ORDER BY label, vec_id""".stripMargin,

    // q129's mutual-kNN chain, then the peel unrolled 10 rounds — the
    // fixpoint is unique, so any depth >= the convergence round (4 at
    // sf0.01, spec-asserted against a sequential peel) states the same
    // table as the engine's converge-then-stop loop. Every round CTE is
    // MATERIALIZED: each e_i is referenced three times (its degree CTE
    // twice over, plus the next round), and DuckDB's default inlining
    // would expand the 10-round chain exponentially — thousands of base
    // scans — where materialization keeps it linear, mirroring the
    // engine's per-round checkpoint.
    "q170_kcore" -> {
      // 11 rounds unrolled, result read at e10: the trailing e11 round is
      // the convergence guard — the WHERE below compares |e10| to |e11|,
      // so data that needs >10 peel rounds yields ZERO rows (a loud
      // rowcount/hash failure at the gate) instead of silently returning
      // a mid-peel superset that happens to match nothing
      val rounds = (0 until 11).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT label, src FROM e$i GROUP BY label, src
           |  HAVING COUNT(*) >= 3),
           |e${i + 1} AS MATERIALIZED (
           |  SELECT e.label, e.src, e.dst FROM e$i e
           |  JOIN d$i a ON a.label = e.label AND a.src = e.src
           |  JOIN d$i b ON b.label = e.label AND b.src = e.dst)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |s AS (
         |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         |    LIST_COSINE_SIMILARITY(a.v, b.v) AS cos
         |  FROM e a JOIN e b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT label, a_id, b_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY a_id
         |                       ORDER BY cos DESC, b_id ASC) AS rnk
         |  FROM s),
         |knn AS (SELECT label, a_id, b_id FROM r WHERE rnk <= 5),
         |mu AS (
         |  SELECT k.label, k.a_id, k.b_id
         |  FROM knn k JOIN knn m
         |    ON k.label = m.label AND k.a_id = m.b_id AND k.b_id = m.a_id
         |  WHERE k.a_id < k.b_id),
         |e0 AS MATERIALIZED (
         |  SELECT label, a_id AS src, b_id AS dst FROM mu
         |  UNION ALL SELECT label, b_id, a_id FROM mu),
         |$rounds
         |SELECT label, src AS vec_id, COUNT(*) AS core_deg
         |FROM e10
         |WHERE (SELECT COUNT(*) FROM e10) = (SELECT COUNT(*) FROM e11)
         |GROUP BY 1, 2 ORDER BY label, vec_id""".stripMargin
    },

    "q201_bfs_hops" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT DISTINCT o.o_custkey AS src,
        |    l.l_suppkey + 1000000 AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |e AS MATERIALIZED (
        |  SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |bfs AS (
        |  SELECT (SELECT MIN(src) FROM e) AS node, 0 AS dist
        |  UNION
        |  SELECT e.dst AS node, bfs.dist + 1 AS dist
        |  FROM bfs JOIN e ON e.src = bfs.node
        |  WHERE bfs.dist < 4)
        |SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
        |FROM bfs GROUP BY node ORDER BY node""".stripMargin,

    "q214_link_prediction" -> (
      """WITH e AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |    LIST_COSINE_SIMILARITY(a.v, b.v) AS cos
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT label, a_id, b_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY a_id
        |                       ORDER BY cos DESC, b_id ASC) AS rnk
        |  FROM s),
        |knn AS (SELECT label, a_id, b_id FROM r WHERE rnk <= 5),
        |mu AS MATERIALIZED (
        |  SELECT k.label, k.a_id, k.b_id
        |  FROM knn k JOIN knn m
        |    ON k.label = m.label AND k.a_id = m.b_id AND k.b_id = m.a_id
        |  WHERE k.a_id < k.b_id),
        |adj AS MATERIALIZED (
        |  SELECT label, a_id AS src, b_id AS dst FROM mu
        |  UNION ALL SELECT label, b_id, a_id FROM mu),
        |dg AS (SELECT label, src, COUNT(*) AS deg FROM adj
        |  GROUP BY 1, 2),
        |wdg AS (
        |  SELECT a1.label, a1.dst AS x, a1.src AS b, a2.dst AS y
        |  FROM adj a1 JOIN adj a2
        |    ON a1.label = a2.label AND a1.src = a2.src
        |  WHERE a1.dst < a2.dst),
        |cand AS (
        |  SELECT w.label, w.x, w.b, w.y
        |  FROM wdg w LEFT JOIN mu
        |    ON mu.label = w.label AND mu.a_id = w.x AND mu.b_id = w.y
        |  WHERE mu.a_id IS NULL),
        |sc AS (
        |  SELECT c.label, c.x, c.y,
        |    COUNT(*) AS common_neighbors,
        |    """.stripMargin +
        graft.Fns.dsum18Sql("1.0 / LN(CAST(dg.deg AS DOUBLE))") + """ AS aa
        |  FROM cand c JOIN dg
        |    ON dg.label = c.label AND dg.src = c.b
        |  GROUP BY 1, 2, 3)
        |SELECT label, x, y, common_neighbors,
        |  ROUND(aa, 6) + 0.0 AS adamic_adar
        |FROM sc WHERE common_neighbors >= 2
        |ORDER BY label, x, y""".stripMargin),

    // q147's chain plus a degree CTE; triangle-free nodes left-join to 0
    "q225_clustering_coefficient" ->
      """WITH e AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |    LIST_COSINE_SIMILARITY(a.v, b.v) AS cos
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT label, a_id, b_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY a_id
        |                       ORDER BY cos DESC, b_id ASC) AS rnk
        |  FROM s),
        |knn AS (SELECT label, a_id, b_id FROM r WHERE rnk <= 5),
        |mu AS MATERIALIZED (
        |  SELECT k.label, k.a_id, k.b_id
        |  FROM knn k JOIN knn m
        |    ON k.label = m.label AND k.a_id = m.b_id AND k.b_id = m.a_id
        |  WHERE k.a_id < k.b_id),
        |dg AS (
        |  SELECT label, vec_id, COUNT(*) AS degree FROM (
        |    SELECT label, UNNEST([a_id, b_id]) AS vec_id FROM mu)
        |  GROUP BY 1, 2),
        |tri AS (
        |  SELECT e1.label, e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
        |  FROM mu e1
        |  JOIN mu e2 ON e1.label = e2.label AND e2.a_id = e1.b_id
        |  JOIN mu e3 ON e3.label = e1.label AND e3.a_id = e1.a_id
        |    AND e3.b_id = e2.b_id),
        |tc AS (
        |  SELECT label, vec_id, COUNT(*) AS n_triangles FROM (
        |    SELECT label, UNNEST([a, b, c]) AS vec_id FROM tri)
        |  GROUP BY 1, 2)
        |SELECT dg.label, dg.vec_id, dg.degree,
        |  COALESCE(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN dg.degree >= 2 THEN
        |    ROUND(2.0 * CAST(COALESCE(tc.n_triangles, 0) AS DOUBLE)
        |      / CAST(dg.degree * (dg.degree - 1) AS DOUBLE), 6) + 0.0
        |  ELSE 0.0 END AS clustering
        |FROM dg LEFT JOIN tc
        |  ON tc.label = dg.label AND tc.vec_id = dg.vec_id
        |ORDER BY dg.label, dg.vec_id""".stripMargin,

    // q129's chain, degrees joined onto both endpoints, one moment agg
    // the scaled-k edge list is q244's own oracle verbatim as a CTE;
    // the moments on top are q230's spelling
    "q252_assortativity_scaledk" ->
      s"""WITH mu AS MATERIALIZED (
         |${graft.llm.SimilarityQueries.oracles("q244_knn_scaledk")}),
         |adj AS MATERIALIZED (
         |  SELECT label, a_id AS src, b_id AS dst FROM mu
         |  UNION ALL SELECT label, b_id, a_id FROM mu),
         |dg AS (SELECT label, src, COUNT(*) AS deg FROM adj GROUP BY 1, 2),
         |m AS (
         |  SELECT adj.label, COUNT(*) AS n_edges,
         |    SUM(dx.deg) AS sx, SUM(dy.deg) AS sy,
         |    SUM(dx.deg * dy.deg) AS sxy,
         |    SUM(dx.deg * dx.deg) AS sxx,
         |    SUM(dy.deg * dy.deg) AS syy
         |  FROM adj
         |  JOIN dg dx ON dx.label = adj.label AND dx.src = adj.src
         |  JOIN dg dy ON dy.label = adj.label AND dy.src = adj.dst
         |  GROUP BY 1)
         |SELECT label, n_edges,
         |  CASE WHEN n_edges * sxx - sx * sx > 0
         |        AND n_edges * syy - sy * sy > 0 THEN
         |    ROUND(CAST(n_edges * sxy - sx * sy AS DOUBLE)
         |      / SQRT(CAST(n_edges * sxx - sx * sx AS DOUBLE)
         |           * CAST(n_edges * syy - sy * sy AS DOUBLE)), 6) + 0.0
         |  END AS assortativity
         |FROM m ORDER BY label""".stripMargin,

    // q170's unrolled peel (unique fixpoint, MATERIALIZED rounds) with
    // the edge CTE swapped for q244's scaled-k oracle verbatim; core
    // order 2 (the sparser probed graph's non-vacuous core — see the
    // query comment), fixpoint ≤ 7 rounds measured at every scale
    "q271_kcore_scaledk" -> {
      // q170's convergence-guard recipe: round 11 exists only so the
      // WHERE can assert the peel reached fixpoint by e10 — an
      // insufficient unroll fails loudly (0 rows) instead of drifting
      val rounds = (0 until 11).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT label, src FROM e$i GROUP BY label, src
           |  HAVING COUNT(*) >= 2),
           |e${i + 1} AS MATERIALIZED (
           |  SELECT e.label, e.src, e.dst FROM e$i e
           |  JOIN d$i a ON a.label = e.label AND a.src = e.src
           |  JOIN d$i b ON b.label = e.label AND b.src = e.dst)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH mu AS MATERIALIZED (
         |${graft.llm.SimilarityQueries.oracles("q244_knn_scaledk")}),
         |e0 AS MATERIALIZED (
         |  SELECT label, a_id AS src, b_id AS dst FROM mu
         |  UNION ALL SELECT label, b_id, a_id FROM mu),
         |$rounds
         |SELECT label, src AS vec_id, COUNT(*) AS core_deg
         |FROM e10
         |WHERE (SELECT COUNT(*) FROM e10) = (SELECT COUNT(*) FROM e11)
         |GROUP BY 1, 2 ORDER BY label, vec_id""".stripMargin
    },

    // q214's wedge/anti-join/AA spelling over q244's scaled-k edge CTE
    "q272_linkpred_scaledk" ->
      s"""WITH mu AS MATERIALIZED (
         |${graft.llm.SimilarityQueries.oracles("q244_knn_scaledk")}),
         |adj AS MATERIALIZED (
         |  SELECT label, a_id AS src, b_id AS dst FROM mu
         |  UNION ALL SELECT label, b_id, a_id FROM mu),
         |dg AS (SELECT label, src, COUNT(*) AS deg FROM adj
         |  GROUP BY 1, 2),
         |wdg AS (
         |  SELECT a1.label, a1.dst AS x, a1.src AS b, a2.dst AS y
         |  FROM adj a1 JOIN adj a2
         |    ON a1.label = a2.label AND a1.src = a2.src
         |  WHERE a1.dst < a2.dst),
         |cand AS (
         |  SELECT w.label, w.x, w.b, w.y
         |  FROM wdg w LEFT JOIN mu
         |    ON mu.label = w.label AND mu.a_id = w.x AND mu.b_id = w.y
         |  WHERE mu.a_id IS NULL),
         |sc AS (
         |  SELECT c.label, c.x, c.y,
         |    COUNT(*) AS common_neighbors,
         |    ${graft.Fns.dsum18Sql("1.0 / LN(CAST(dg.deg AS DOUBLE))")}
         |      AS aa
         |  FROM cand c JOIN dg
         |    ON dg.label = c.label AND dg.src = c.b
         |  GROUP BY 1, 2, 3)
         |SELECT label, x, y, common_neighbors,
         |  ROUND(aa, 6) + 0.0 AS adamic_adar
         |FROM sc WHERE common_neighbors >= 2
         |ORDER BY label, x, y""".stripMargin,

    // q147's oriented-triangle spelling over q244's scaled-k edge CTE
    "q283_triangles_scaledk" ->
      s"""WITH mu AS MATERIALIZED (
         |${graft.llm.SimilarityQueries.oracles("q244_knn_scaledk")}),
         |tri AS (
         |  SELECT e1.label, e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |  FROM mu e1
         |  JOIN mu e2 ON e1.label = e2.label AND e2.a_id = e1.b_id
         |  JOIN mu e3 ON e3.label = e1.label AND e3.a_id = e1.a_id
         |    AND e3.b_id = e2.b_id),
         |n AS (SELECT label, UNNEST([a, b, c]) AS vec_id FROM tri)
         |SELECT label, vec_id, COUNT(*) AS n_triangles
         |FROM n GROUP BY 1, 2 ORDER BY label, vec_id""".stripMargin,

    // q225's degree/triangle/C(v) spelling over q244's scaled-k edge CTE
    "q284_clustering_scaledk" ->
      s"""WITH mu AS MATERIALIZED (
         |${graft.llm.SimilarityQueries.oracles("q244_knn_scaledk")}),
         |dg AS (
         |  SELECT label, vec_id, COUNT(*) AS degree FROM (
         |    SELECT label, UNNEST([a_id, b_id]) AS vec_id FROM mu)
         |  GROUP BY 1, 2),
         |tri AS (
         |  SELECT e1.label, e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |  FROM mu e1
         |  JOIN mu e2 ON e1.label = e2.label AND e2.a_id = e1.b_id
         |  JOIN mu e3 ON e3.label = e1.label AND e3.a_id = e1.a_id
         |    AND e3.b_id = e2.b_id),
         |tc AS (
         |  SELECT label, vec_id, COUNT(*) AS n_triangles FROM (
         |    SELECT label, UNNEST([a, b, c]) AS vec_id FROM tri)
         |  GROUP BY 1, 2)
         |SELECT dg.label, dg.vec_id, dg.degree,
         |  COALESCE(tc.n_triangles, 0) AS n_triangles,
         |  CASE WHEN dg.degree >= 2 THEN
         |    ROUND(2.0 * CAST(COALESCE(tc.n_triangles, 0) AS DOUBLE)
         |      / CAST(dg.degree * (dg.degree - 1) AS DOUBLE), 6) + 0.0
         |  ELSE 0.0 END AS clustering
         |FROM dg LEFT JOIN tc
         |  ON tc.label = dg.label AND tc.vec_id = dg.vec_id
         |ORDER BY dg.label, dg.vec_id""".stripMargin,

    "q230_degree_assortativity" ->
      """WITH e AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |    LIST_COSINE_SIMILARITY(a.v, b.v) AS cos
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT label, a_id, b_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY a_id
        |                       ORDER BY cos DESC, b_id ASC) AS rnk
        |  FROM s),
        |knn AS (SELECT label, a_id, b_id FROM r WHERE rnk <= 5),
        |mu AS MATERIALIZED (
        |  SELECT k.label, k.a_id, k.b_id
        |  FROM knn k JOIN knn m
        |    ON k.label = m.label AND k.a_id = m.b_id AND k.b_id = m.a_id
        |  WHERE k.a_id < k.b_id),
        |adj AS MATERIALIZED (
        |  SELECT label, a_id AS src, b_id AS dst FROM mu
        |  UNION ALL SELECT label, b_id, a_id FROM mu),
        |dg AS (SELECT label, src, COUNT(*) AS deg FROM adj GROUP BY 1, 2),
        |m AS (
        |  SELECT adj.label, COUNT(*) AS n_edges,
        |    SUM(dx.deg) AS sx, SUM(dy.deg) AS sy,
        |    SUM(dx.deg * dy.deg) AS sxy,
        |    SUM(dx.deg * dx.deg) AS sxx,
        |    SUM(dy.deg * dy.deg) AS syy
        |  FROM adj
        |  JOIN dg dx ON dx.label = adj.label AND dx.src = adj.src
        |  JOIN dg dy ON dy.label = adj.label AND dy.src = adj.dst
        |  GROUP BY 1)
        |SELECT label, n_edges,
        |  CASE WHEN n_edges * sxx - sx * sx > 0
        |        AND n_edges * syy - sy * sy > 0 THEN
        |    ROUND(CAST(n_edges * sxy - sx * sy AS DOUBLE)
        |      / SQRT(CAST(n_edges * sxx - sx * sx AS DOUBLE)
        |           * CAST(n_edges * syy - sy * sy AS DOUBLE)), 6) + 0.0
        |  END AS assortativity
        |FROM m ORDER BY label""".stripMargin,

    // the two HITS rounds unrolled (the q107 recipe): every half-step
    // is the same join+group shape, every normalization the same
    // exact-decimal total
    "q246_hits" ->
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_partkey AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |a0 AS (SELECT DISTINCT dst AS node, 1.0 AS score FROM e),
         |h1r AS (
         |  SELECT e.src AS node, ${Fns.dsum18Sql("a0.score")} AS raw
         |  FROM e JOIN a0 ON a0.node = e.dst GROUP BY e.src),
         |h1t AS (SELECT ${Fns.dsum18Sql("raw")} AS tot FROM h1r),
         |h1 AS (SELECT node, raw / tot AS score
         |       FROM h1r CROSS JOIN h1t),
         |a1r AS (
         |  SELECT e.dst AS node, ${Fns.dsum18Sql("h1.score")} AS raw
         |  FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
         |a1t AS (SELECT ${Fns.dsum18Sql("raw")} AS tot FROM a1r),
         |a1 AS (SELECT node, raw / tot AS score
         |       FROM a1r CROSS JOIN a1t),
         |h2r AS (
         |  SELECT e.src AS node, ${Fns.dsum18Sql("a1.score")} AS raw
         |  FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
         |h2t AS (SELECT ${Fns.dsum18Sql("raw")} AS tot FROM h2r),
         |h2 AS (SELECT node, raw / tot AS score
         |       FROM h2r CROSS JOIN h2t),
         |a2r AS (
         |  SELECT e.dst AS node, ${Fns.dsum18Sql("h2.score")} AS raw
         |  FROM e JOIN h2 ON h2.node = e.src GROUP BY e.dst),
         |a2t AS (SELECT ${Fns.dsum18Sql("raw")} AS tot FROM a2r),
         |a2 AS (SELECT node, raw / tot AS score
         |       FROM a2r CROSS JOIN a2t)
         |SELECT kind, node, score FROM (
         |  SELECT 'hub' AS kind, node, ROUND(score, 6) + 0.0 AS score
         |  FROM h2
         |  UNION ALL
         |  SELECT 'auth' AS kind, node, ROUND(score, 6) + 0.0 AS score
         |  FROM a2)
         |ORDER BY kind, node""".stripMargin,

    // Bellman-Ford unrolled 9 rounds (the q170 recipe applied to
    // min-plus): each round CTE is nodes-sized — one edges×state join +
    // one group-min, NEVER a path enumeration — and MATERIALIZED so the
    // chain stays linear. The result reads round 8 (the kernel's declared
    // depth) and the trailing round 9 is the convergence guard: equal
    // row count AND no node whose distance still moved, else zero rows.
    "q292_weighted_sssp" -> {
      val rounds = (0 until 9).map { i =>
        s"""d${i + 1} AS MATERIALIZED (
           |  SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM d$i
           |    UNION ALL
           |    SELECT e.dst AS node, d$i.dist + e.w AS dist
           |    FROM d$i JOIN e ON e.src = d$i.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
         |    CAST(1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |e AS MATERIALIZED (
         |  SELECT src, dst, w FROM e0
         |  UNION ALL SELECT dst, src, w FROM e0),
         |d0 AS (SELECT (SELECT MIN(src) FROM e) AS node,
         |       CAST(0 AS DOUBLE) AS dist),
         |$rounds
         |SELECT node, ROUND(dist, 6) + 0.0 AS dist
         |FROM d8
         |WHERE (SELECT COUNT(*) FROM d8) = (SELECT COUNT(*) FROM d9)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM d8 a JOIN d9 b ON a.node = b.node
         |    WHERE a.dist <> b.dist)
         |ORDER BY node""".stripMargin
    })
}
