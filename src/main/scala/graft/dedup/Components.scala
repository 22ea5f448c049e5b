package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the dedup-pipeline
  * step between pair generation (MinHash/LSH/SimHash candidates, reference
  * dedup behavior; see queries d3/d4/d6/d7) and "keep one document per
  * duplicate cluster": every document gets the min doc-id of its component
  * as its cluster representative.
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING
  * (Shiloach–Vishkin style, the public large-graph CC recipe used by
  * GraphX/GraphFrames): each round every node takes the min label among
  * itself and its neighbors (one join + one groupBy = two shuffles), then
  * label(v) ← label(label(v)) (one self-join) halves label-tree height, so
  * convergence is O(log diameter) rounds, not O(diameter) — a 100-TB graph
  * of near-dup cliques (diameter 1–2) and long chains (diameter up to
  * thousands) both converge in a handful of rounds. The fixpoint (min id
  * reachable) is unique, so results are independent of partitioning,
  * iteration count, and join order — which is what makes the operator
  * oracle-checkable against a recursive-CTE label closure.
  */
object Components {

  /** Bounded PRIMITIVE edge buffer for the gate+gather aggregate: the
    * documented 2-longs-per-edge memory shape for real. A generic
    * ArrayBuffer[Long] boxes every element into an Array[AnyRef]
    * (~3× the heap per state and boxed Java-serialized task results on
    * the wire, multiplied by concurrent tasks in the over-cap case);
    * this holds a growable Array[Long] capped at `cap` entries, so each
    * partial/merged state is ≤ 8·cap bytes exactly. */
  private final class LongBuf(cap: Int) extends Serializable {
    var arr: Array[Long] = new Array[Long](math.min(cap, 1 << 14))
    var used: Int = 0
    def add2(a: Long, b: Long): Unit =
      if (used + 2 <= cap) {
        if (used + 2 > arr.length)
          arr = java.util.Arrays.copyOf(
            arr, math.min(cap, math.max(arr.length * 2, used + 2)))
        arr(used) = a; arr(used + 1) = b; used += 2
      }
  }

  /** [[connectedComponents]] with a SIZE-GATED driver-local fast path:
    * ONE job over the edge relation both decides and gathers — a
    * treeAggregate that carries the exact edge count plus (up to the
    * cap) the edges themselves, so at or under `localEdgeCap` edges the
    * graph is already on the driver when the gate fires and a
    * union-find labels it in milliseconds; above the cap the gathered
    * prefix is discarded and the distributed pointer-jumping loop runs
    * unchanged. Fusing gate and gather halves the driver actions of the
    * fast path (round-12 shape: count job + collect job; round 13: one
    * treeAggregate job, which also doubles as the materializer of a
    * persisted edge input).
    *
    * Why the gate at all: the distributed loop costs ~7–10 s per
    * convergence round at local[32] in pure scheduling (5 shuffle
    * stages + an eager checkpoint + a convergence count per round)
    * REGARDLESS of edge count — the right price for a billion-edge
    * graph, absurd for the 51 verified near-dup pairs a clean corpus
    * yields (x26's fuzzy stage paid 20+ s of fixed overhead on it).
    * The gate is an explicit EDGE-COUNT bound, not an assumption: a
    * 100-TB corpus whose dup rate produces billions of candidate edges
    * takes the distributed path automatically. Memory is bounded at
    * every point of the aggregation — each partial and merged state
    * holds at most `localEdgeCap + 1` edges (2 longs each; 16 MB at the
    * default cap, the order of a broadcast-join threshold), combined on
    * executors tree-wise before one state reaches the driver — so the
    * over-cap case never concentrates the edge set anywhere. The
    * over-cap scan pays row iteration instead of a codegen'd count;
    * that delta is noise next to the distributed loop it precedes.
    * Identical labeling semantics (comp = min reachable id; equality
    * spec-asserted against the distributed path on mixed
    * clique/chain/star graphs). */
  def connectedComponentsAuto(edges: DataFrame, aCol: String, bCol: String,
                              localEdgeCap: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(localEdgeCap >= 0 && localEdgeCap < Int.MaxValue / 2,
      s"localEdgeCap out of range: $localEdgeCap")
    val capLongs = 2 * (localEdgeCap.toInt + 1) // a,b per edge; cap+1 detects overflow
    val err = s"null or non-numeric id in connectedComponentsAuto($aCol,$bCol)"
    val (n, gathered) = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .rdd
      .treeAggregate((0L, new LongBuf(capLongs)))(
        seqOp = { case ((c, buf), r) =>
          require(!r.isNullAt(0) && !r.isNullAt(1), err)
          buf.add2(r.getLong(0), r.getLong(1))
          (c + 1L, buf)
        },
        combOp = { case ((c1, b1), (c2, b2)) =>
          val (big, small) = if (b1.used >= b2.used) (b1, b2) else (b2, b1)
          var i = 0
          while (big.used < capLongs && i + 1 < small.used) {
            big.add2(small.arr(i), small.arr(i + 1)); i += 2
          }
          (c1 + c2, big)
        })
    if (n > localEdgeCap) return connectedComponents(edges, aCol, bCol)
    val pairs = Array.tabulate(gathered.used / 2)(i =>
      (gathered.arr(2 * i), gathered.arr(2 * i + 1)))
    // union-find with path halving; roots resolved, then component label
    // = min member id (the distributed fixpoint's exact semantics)
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      while (p != x) {
        val gp = parent.get(p)
        parent.put(x, gp)
        x = gp
        p = parent.get(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val byRoot = new java.util.HashMap[Long, Long]() // root -> min member
    parent.keySet().forEach { v =>
      val r = find(v)
      val cur = byRoot.getOrDefault(r, Long.MaxValue)
      if (v < cur) byRoot.put(r, v)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    parent.keySet().forEach { v => out += ((v, byRoot.get(find(v)))) }
    out.toSeq.toDF("id", "comp")
  }

  /** (id, comp) for every node appearing in `edges` (undirected); comp =
    * min node id in the connected component. Iterates to the fixpoint
    * (bounded by `maxIter`, loud failure if not converged — never a
    * silently-partial clustering). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    // ids that cast to null (null edge values, non-numeric id columns)
    // would silently vanish from the joins — fail loudly instead
    // (assert_true throws per offending row; coalesce passes the value)
    def id(c: String) = coalesce(
      assert_true(col(c).cast("long").isNotNull,
        lit(s"null or non-numeric id in connectedComponents($c)")),
      col(c).cast("long"))
    val a = id(aCol); val b = id(bCol)
    // undirected adjacency, both directions; persisted — every round scans it
    val adj = edges.select(a.as("src"), b.as("dst"))
      .unionByName(edges.select(b.as("src"), a.as("dst")))
      .distinct().persist()
    // Each round's plan references the previous labels FOUR times (neighbor
    // join + left join + both sides of the jump self-join), so carrying
    // lineage across rounds grows the logical plan 4^rounds — analysis and
    // codegen OOM the driver long before data size matters. Eager
    // localCheckpoint materializes each round AND truncates lineage to the
    // materialized blocks (on a cluster with dynamic allocation or flaky
    // executors, swap for reliable checkpoint() — same contract).
    // no checkpoint on the seed — it reads the persisted adjacency and the
    // first round's checkpoint re-roots the lineage.
    //
    // SEEDED START: label₀(v) = min(v, min neighbor id). Deriving the node
    // set needs a shuffle over adj anyway (the old shape was
    // select(src).distinct()); a groupBy(src).min(dst) costs the SAME one
    // shuffle but banks a free neighbor-min half-round. For the dominant
    // dedup graph shape — star edges (bucket-min → member), where every
    // component is a union of stars — the seed IS already the fixpoint, so
    // the loop's first round detects changed==0 and the whole run is ONE
    // round instead of two (propagate + verify). Chains still converge in
    // O(log diameter) as before; the fixpoint is unique so results are
    // unchanged.
    var labels = adj.groupBy(col("src").as("id")).agg(min(col("dst")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("comp"))
    var it = 0
    var changed = 1L
    // superseded rounds' checkpoint blocks are released as soon as the next
    // round is materialized — an N-round run pins ONE block-set, not N (the
    // leak would compound across repeated CC runs in a long-lived session)
    var prevPinned: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    try {
      while (changed > 0 && it < maxIter) {
        // neighbor-min: comp'(v) = min(comp(v), min over neighbors comp(u));
        // the previous label rides along so convergence detection needs no
        // second join — the changed-count scans the round's materialized
        // blocks instead of re-deriving the round
        val nbrMin = adj
          .join(labels.select(col("id").as("src"), col("comp").as("srcComp")), "src")
          .groupBy(col("dst").as("id")).agg(min(col("srcComp")).as("nbrComp"))
        val prop = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("comp").as("prev"),
            least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
        // pointer jumping: comp''(v) = comp'(comp'(v)). Labels are node ids
        // and only ever decrease, so comp'(c) exists for every label c and
        // the jump is monotone — inner join is total.
        val next = prop.as("p")
          .join(prop.select(col("id").as("c"), col("comp").as("cc")).as("m"),
            col("p.comp") === col("m.c"))
          .select(col("p.id").as("id"), col("m.cc").as("comp"),
            (col("m.cc") =!= col("p.prev")).as("ch"))
          .localCheckpoint(true)
        // eager checkpoint: `next` is fully materialized here, so the
        // previous round's blocks are dead weight — release them now
        prevPinned.foreach(_.unpersist(false))
        prevPinned = checkpointRdds(next)
        changed = next.filter(col("ch")).count()
        labels = next.select(col("id"), col("comp"))
        it += 1
      }
      require(changed == 0,
        s"connectedComponents did not converge in $maxIter iterations")
    } finally adj.unpersist() // also on the non-convergence throw — no leak
    labels
  }

  /** The localCheckpoint-materialized RDDs backing a frame (LogicalRDD
    * leaves). The FINAL round's blocks are the returned labels' storage —
    * pinned by design while the result is in use, like `persist`. */
  private def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** Release the checkpoint blocks backing a [[connectedComponents]] result
    * (or any frame derived from one — [[assign]] output included). Call when
    * done consuming the labels; the frame must not be re-executed after.
    * The persist/unpersist contract, for an operator whose storage is a
    * lineage-truncating checkpoint `clearCache()` cannot see. */
  def release(labels: DataFrame): Unit =
    checkpointRdds(labels).foreach(_.unpersist(false))

  /** Cluster assignment for a document table: (docs ⟕ components), nodes
    * with no candidate edge are singleton clusters of themselves, plus the
    * component size — the table a dedup pipeline filters with
    * `comp_id = doc_id` (keep representatives) or samples per cluster. */
  def assign(docs: DataFrame, idCol: String, comps: DataFrame): DataFrame = {
    // comp_size via groupBy + join, NOT Window.partitionBy(comp_id): a
    // degenerate corpus whose duplicates collapse into one giant component
    // would put the entire component into a single window partition — a
    // straggler/spill at exactly the scale this operator exists for.
    //
    // Sizes come from `comps` ALONE (each edge-touched node appears exactly
    // once there, so count-per-comp == member count), never from the
    // docs ⟕ comps join: the old shape grouped the joined projection and
    // re-joined it, executing the docs ⟕ comps subtree twice per run. Nodes
    // absent from `comps` are singletons of size 1 via the left join.
    // Precondition (holds for every caller — comps is derived from edges
    // over these docs): comps.id ⊆ docs.idCol.
    //
    // `sizes` is one row per component — orders of magnitude smaller than
    // docs — so the final join broadcasts and the skewed comp_id
    // distribution never shuffles the probe side.
    val sizes = comps.groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("comp_size"))
    docs.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("comp_id"))
      .join(sizes, Seq("comp_id"), "left")
      .select(col(idCol), col("comp_id"),
        coalesce(col("comp_size"), lit(1L)).as("comp_size"))
  }
}
