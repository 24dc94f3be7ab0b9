package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.index.IndexConfig
import graft.index.covering.CoveringIndexConfig

/**
 * Index-corpus width governance as a CHECK, not a scaladoc convention
 * (ROUNDLOG findings #11/#12a). The ranker's narrowest-first rule and
 * its name tie-break mean that ADDING a layout can silently flip the
 * plan of every query an existing layout serves:
 *
 *  - finding #11: an equal-width same-key twin turns a principled
 *    narrowness race into a name race (ordLag carries o_totalprice
 *    deliberately, to stay strictly wider than ordSnow3);
 *  - finding #12a: a layout widened into ANOTHER bucket key's consumer
 *    column set re-opens rankings in every query that set serves
 *    (adding l_suppkey to the partkey layout flipped qds65 1→3
 *    exchanges; reverted).
 *
 * This spec pins the corpus GEOMETRY — the facts those rankings are a
 * function of — as literal approved sets, computed purely from the
 * configs (no Spark session, no index builds):
 *
 *  1. the narrowness-race order per (table, bucket key);
 *  2. every cross-bucket-key coverage edge (layout A's referenced set
 *     ⊇ layout B's, with different bucket keys) — each surviving edge
 *     is individually justified below;
 *  3. every same-key equal-width tie class, with the rule that makes
 *     it benign (key-only intersection, or a strictly narrower
 *     arbiter covering the intersection).
 *
 * A future index addition that re-opens a ranking MUST change one of
 * these sets, so this spec fails by name and the author re-approves
 * consciously — the same contract as a golden plan, one level earlier.
 * The reverted qds65 widening is the seeded negative: the checker must
 * detect it as a NEW cross-key edge.
 */
class CorpusGovernanceSpec extends AnyFunSuite {

  private case class Layout(table: String, name: String,
      keys: Seq[String], refs: Set[String]) {
    def width: Int = refs.size
  }

  private def model(entries: Seq[(String, IndexConfig)]): Seq[Layout] =
    entries.collect { case (t, c: CoveringIndexConfig) =>
      Layout(t, c.indexName, c.indexedColumns,
        c.referencedColumns.map(_.toLowerCase).toSet)
    }

  private val corpus: Seq[Layout] = model(AccelIndexes.all)

  /** (table, bucket keys) -> layout names in narrowness-race order
    * (width, then name — the ranker's same-key ordering surface). */
  private def races(ls: Seq[Layout]): Map[String, Seq[String]] =
    ls.groupBy(l => s"${l.table}(${l.keys.mkString(",")})")
      .view.mapValues(_.sortBy(l => (l.width, l.name)).map(l => s"${l.name}:${l.width}"))
      .toMap

  /** Cross-bucket-key coverage edges: A's referenced set covers B's
    * whole referenced set while bucketed on a DIFFERENT key — the
    * finding-#12a shape. Every edge widens the set of rankings a
    * B-aimed query can fall into. */
  private def crossKeyEdges(ls: Seq[Layout]): Set[String] =
    (for {
      a <- ls; b <- ls
      if a.table == b.table && a.keys != b.keys && a.refs.subsetOf(b.refs)
    } yield s"${b.name} covers ${a.name}").toSet

  /** Same-(table,key) equal-width tie pairs with their intersection —
    * the finding-#11 shape (the narrowness race cannot arbitrate; the
    * name does). */
  private def tiePairs(ls: Seq[Layout]): Set[String] =
    (for {
      Seq(a, b) <- ls.groupBy(l => (l.table, l.keys)).values
        .flatMap(_.combinations(2)).toSeq
      if a.width == b.width && a.refs != b.refs
    } yield {
      val Seq(x, y) = Seq(a, b).sortBy(_.name)
      s"${x.name} ~ ${y.name} on (${(x.refs intersect y.refs).toSeq.sorted.mkString(",")})"
    }).toSet

  // ------------------------------------------------------------------
  // Approved geometry. Changing the corpus changes these: re-approve
  // CONSCIOUSLY, checking every new edge/tie against findings #11/#12a
  // (inspect TpcdsShapeSpec + GoldenPlanSpec for flips first).
  // ------------------------------------------------------------------

  private val ApprovedRaces: Map[String, Seq[String]] = Map(
    "lineitem(l_orderkey)" -> Seq(
      "accel_ci_li_join:2", "accel_ci_li:3", "accel_ci_li_rev:3",
      "accel_ci_li_ship:4", "accel_ci_li_wide:5", "accel_ci_li_qty:6",
      // r17: liChan widened to the FULL lineitem cover (the q16 lesson:
      // exists-probe outer legs rewrite pre-pruning and need a full
      // cover). Still the strict-widest orderkey layout; l_tax and
      // l_linestatus are referenced by no other layout, so the widening
      // opened no cross-key edge and no tie.
      "accel_ci_li_chan:11"),
    "lineitem(l_partkey)" -> Seq(
      "accel_ci_li_bypart:5", "accel_ci_li_inv:6", "accel_ci_li_partchan:8"),
    "lineitem(l_suppkey)" -> Seq(
      "accel_ci_li_supp:2", "accel_ci_li_suppqty:3", "accel_ci_li_bysupp:4",
      "accel_ci_li_suppchan:6"),
    "orders(o_orderkey)" -> Seq(
      "accel_ci_ord_join:2", "accel_ci_ord_snow:2",
      "accel_ci_ord_snow3prio:2", "accel_ci_ord_snow3:3",
      "accel_ci_ord_lag:4"),
    "orders(o_custkey)" -> Seq(
      "accel_ci_ord_agg:2", "accel_ci_ord_prio:3", "accel_ci_ord_bycust:4"),
    "customer(c_custkey)" -> Seq(
      "accel_ci_cust:2", "accel_ci_cust_dim:3", "accel_ci_cust_nat:3",
      "accel_ci_cust_seg:3", "accel_ci_cust_full:5"),
    "supplier(s_suppkey)" -> Seq(
      "accel_ci_supp_dim:2", "accel_ci_supp_nat:3"),
    "part(p_partkey)" -> Seq(
      "accel_ci_part_dim:2", "accel_ci_part_attr:3"),
    "nation(n_nationkey)" -> Seq("accel_ci_nation_dim:3"))

  /** The approved inventory, grouped by WHY each edge is tolerated
    * (every group is covered by green plan audits today — the value of
    * this pin is that a NEW edge cannot appear silently):
    *  - WIDEST-CHANNEL SUPERSETS: li_chan (ok) and li_partchan (pk)
    *    are deliberate channel twins; li_chan additionally spans the
    *    suppkey sets (supp/suppqty/suppchan/bysupp). Cross-key
    *    consumers only reach them through composite-key shapes, where
    *    bucket-key eligibility and the r16 pair-coherence vote
    *    arbitrate (qds40) — single-key consumers of the covered
    *    layouts cannot ride a differently-keyed cover at all.
    *  - WIDE-FACT ⊇ NARROW-PROBE: inv/qty/ship/wide/bypart covering
    *    li_join/li/li_rev/li_supp — every wide fact layout carries the
    *    money columns; the narrow layouts keep winning their own-key
    *    races on width.
    *  - SNOWFLAKE ⊇ JOIN LEGS: ord_bycust (ck) covers the orderkey
    *    legs' sets; orderkey joins can't ride custkey buckets.
    * The qds65 seeded negative (li_partchan covering li_bysupp) is
    * NOT in this set — a partkey layout absorbing the suppkey
    * consumer set is exactly the class that flipped 1→3 exchanges. */
  private val ApprovedCrossKeyEdges: Set[String] = Set(
    "accel_ci_li_bypart covers accel_ci_li_join",
    "accel_ci_li_bypart covers accel_ci_li_rev",
    "accel_ci_li_chan covers accel_ci_li_bypart",
    "accel_ci_li_chan covers accel_ci_li_bysupp",
    "accel_ci_li_chan covers accel_ci_li_inv",
    "accel_ci_li_chan covers accel_ci_li_partchan",
    "accel_ci_li_chan covers accel_ci_li_supp",
    "accel_ci_li_chan covers accel_ci_li_suppchan",
    "accel_ci_li_chan covers accel_ci_li_suppqty",
    "accel_ci_li_inv covers accel_ci_li",
    "accel_ci_li_inv covers accel_ci_li_join",
    "accel_ci_li_inv covers accel_ci_li_supp",
    "accel_ci_li_inv covers accel_ci_li_suppqty",
    "accel_ci_li_partchan covers accel_ci_li",
    "accel_ci_li_partchan covers accel_ci_li_join",
    "accel_ci_li_partchan covers accel_ci_li_rev",
    "accel_ci_li_qty covers accel_ci_li_supp",
    "accel_ci_li_ship covers accel_ci_li_supp",
    "accel_ci_li_wide covers accel_ci_li_bysupp",
    "accel_ci_li_wide covers accel_ci_li_supp",
    "accel_ci_ord_bycust covers accel_ci_ord_join",
    "accel_ci_ord_bycust covers accel_ci_ord_snow",
    "accel_ci_ord_bycust covers accel_ci_ord_snow3")

  /** Ties are benign only under one of two rules:
    *  - KEY-ONLY intersection: a query covered by both twins needs
    *    only the bucket key — either serves identically (same
    *    partitioning claim, same width); the name pick is harmless.
    *  - NARROWER ARBITER: a strictly narrower same-key layout covers
    *    the intersection, so any query tied between the twins is won
    *    by the arbiter before the name is consulted.
    *  - customer dim twins (dim/nat/seg): every pairwise intersection
    *    is {c_custkey, c_nationkey}, served by name order (custDim
    *    first) where no arbiter exists — TOLERATED and pinned here
    *    because every customer layout claims the SAME c_custkey
    *    bucketing (one key on the table ⇒ no cross-key alignment can
    *    be lost; only covered-column bytes differ). */
  private val ApprovedTiePairs: Set[String] = Set(
    "accel_ci_li ~ accel_ci_li_rev on (l_extendedprice,l_orderkey)",
    "accel_ci_ord_join ~ accel_ci_ord_snow on (o_orderkey)",
    "accel_ci_ord_join ~ accel_ci_ord_snow3prio on (o_orderkey)",
    "accel_ci_ord_snow ~ accel_ci_ord_snow3prio on (o_orderkey)",
    "accel_ci_cust_dim ~ accel_ci_cust_nat on (c_custkey,c_nationkey)",
    "accel_ci_cust_dim ~ accel_ci_cust_seg on (c_custkey,c_nationkey)",
    "accel_ci_cust_nat ~ accel_ci_cust_seg on (c_custkey,c_nationkey)")

  test("narrowness-race order per (table, bucket key) is exactly the " +
      "approved one") {
    assert(races(corpus) == ApprovedRaces,
      s"corpus races changed:\n${races(corpus).toSeq.sortBy(_._1)
        .map { case (k, v) => s"  $k -> ${v.mkString(", ")}" }
        .mkString("\n")}")
  }

  test("cross-bucket-key coverage edges are exactly the approved, " +
      "individually-justified set") {
    val actual = crossKeyEdges(corpus)
    val added = actual -- ApprovedCrossKeyEdges
    val removed = ApprovedCrossKeyEdges -- actual
    assert(added.isEmpty && removed.isEmpty,
      s"cross-key coverage changed — new edges re-open rankings in " +
        s"every query the covered set serves (finding #12a).\n" +
        s"  added:   ${added.toSeq.sorted.mkString("; ")}\n" +
        s"  removed: ${removed.toSeq.sorted.mkString("; ")}")
  }

  test("same-key equal-width tie classes are exactly the approved ones " +
      "(each benign per the documented rule)") {
    assert(tiePairs(corpus) == ApprovedTiePairs,
      s"tie classes changed (finding #11):\n  ${tiePairs(corpus).toSeq
        .sorted.mkString("\n  ")}")
  }

  test("li/li_rev tie is arbitrated: a strictly narrower same-key " +
      "layout covers their intersection") {
    val inter = Set("l_extendedprice", "l_orderkey")
    val arbiter = corpus.find(l => l.table == "lineitem" &&
      l.keys == Seq("l_orderkey") && l.width < 3 && inter.subsetOf(l.refs))
    assert(arbiter.exists(_.name == "accel_ci_li_join"))
  }

  test("SEEDED NEGATIVE: the reverted qds65 widening (l_suppkey into " +
      "the partkey channel layout) is detected as a new cross-key edge " +
      "covering the suppkey consumer set") {
    val widened = AccelIndexes.all.map {
      case ("lineitem", c: CoveringIndexConfig)
          if c.indexName == "accel_ci_li_partchan" =>
        "lineitem" -> c.copy(includedColumns = c.includedColumns :+ "l_suppkey")
      case other => other
    }
    val edges = crossKeyEdges(model(widened))
    val added = edges -- ApprovedCrossKeyEdges
    // the widened partkey layout now covers the suppkey-bucketed
    // consumer set that qds65 rides — exactly the 1→3-exchange flip
    assert(added.contains("accel_ci_li_partchan covers accel_ci_li_bysupp"),
      s"the seeded hazard must be detected; added edges: $added")
  }
}
