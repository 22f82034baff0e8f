package graft.fuzz

import org.scalacheck.Gen

/** Random-SQL generator over the validator's de facto admitted surface
  * (SURVEY.md §2.3: any SELECT that prefix-matches a whitelist shape
  * minus blocked tokens). Statements are rendered in the COMMON
  * Spark ∩ DuckDB dialect so the exact same text runs on both engines
  * and must hash-match — the dialect discipline is the same toolbox the
  * 52 fixed q-entries use:
  *
  *  - every ORDER BY key carries an explicit NULLS FIRST/LAST (the
  *    engines' ASC defaults differ);
  *  - LIMIT only ever appears under an ORDER BY over ALL projected
  *    columns, so the prefix is deterministic up to interchangeable
  *    duplicate rows;
  *  - SUM over integer columns is wrapped CAST(... AS BIGINT) (DuckDB
  *    widens to HUGEINT, Spark stays BIGINT);
  *  - no SUM/AVG over DOUBLE columns (parallel summation order makes
  *    the low bits engine-dependent); MIN/MAX/COUNT are order-free;
  *  - AVG over ints is exact (integer sum, one division);
  *  - EXTRACT results are cast to INTEGER (DuckDB returns BIGINT);
  *  - every computed column gets an explicit alias, identical on both
  *    sides by construction;
  *  - timestamp predicates use plain STRING literals ('yyyy-MM-dd
  *    HH:mm:ss'): both engines coerce a string against the column's
  *    own timestamp flavor, whereas a typed TIMESTAMP literal breaks
  *    Spark-side against TIMESTAMP_NTZ-inferred date columns;
  *  - set ops are INTERSECT/EXCEPT only (set-distinct semantics match
  *    across engines; UNION is validator-blocked) with a trailing
  *    ordinal ORDER BY that binds the set-op result in both dialects.
  *
  * Value pools (string literals, numeric pivots) are sampled from the
  * actual tables at spec startup, so predicates hit real selectivities
  * at any scale factor.
  */
object SqlFuzz {

  final case class Col(name: String, typ: String) // int | long | double | string | ts
  final case class Table(name: String, cols: Seq[Col])

  val tables: Seq[Table] = Seq(
    Table("region", Seq(Col("r_regionkey", "int"), Col("r_name", "string"))),
    Table("nation", Seq(Col("n_nationkey", "int"), Col("n_name", "string"),
      Col("n_regionkey", "int"))),
    Table("customer", Seq(Col("c_custkey", "long"), Col("c_name", "string"),
      Col("c_nationkey", "int"), Col("c_acctbal", "double"),
      Col("c_mktsegment", "string"))),
    Table("supplier", Seq(Col("s_suppkey", "long"), Col("s_name", "string"),
      Col("s_nationkey", "int"), Col("s_acctbal", "double"))),
    Table("part", Seq(Col("p_partkey", "long"), Col("p_name", "string"),
      Col("p_brand", "string"), Col("p_type", "string"),
      Col("p_size", "int"), Col("p_retailprice", "double"))),
    Table("orders", Seq(Col("o_orderkey", "long"), Col("o_custkey", "long"),
      Col("o_orderstatus", "string"), Col("o_totalprice", "double"),
      Col("o_orderdate", "ts"), Col("o_orderpriority", "string"))),
    Table("lineitem", Seq(Col("l_orderkey", "long"), Col("l_partkey", "long"),
      Col("l_suppkey", "long"), Col("l_linenumber", "int"),
      Col("l_quantity", "double"), Col("l_extendedprice", "double"),
      Col("l_discount", "double"), Col("l_tax", "double"),
      Col("l_returnflag", "string"), Col("l_linestatus", "string"),
      Col("l_shipdate", "ts"))),
    Table("events", Seq(Col("event_id", "long"), Col("user_id", "long"),
      Col("event_type", "string"), Col("value", "double"))))

  /** Join graph: (left table, left key, right table, right key). */
  val joins: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** Per-column literal pools, sampled from the data by the spec:
    * strings → distinct values; numerics → quantile-ish pivots;
    * times → 'yyyy-MM-dd HH:mm:ss' quantile pivots (rendered as plain
    * string literals — both engines coerce a string against a
    * timestamp column identically, whereas a typed TIMESTAMP literal
    * trips Spark's TIMESTAMP vs TIMESTAMP_NTZ comparison on the
    * NTZ-inferred date columns).
    */
  final case class Pools(strings: Map[String, Seq[String]],
                         numbers: Map[String, Seq[String]],
                         times: Map[String, Seq[String]] = Map.empty)

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---- predicates -------------------------------------------------

  private def numPred(qual: String, c: Col, pools: Pools): Gen[String] = {
    val pivots = pools.numbers.getOrElse(c.name, Seq("0"))
    val simple = for {
      p <- Gen.oneOf(pivots)
      op <- Gen.oneOf("<", "<=", ">", ">=", "=", "<>")
    } yield s"$qual${c.name} $op $p"
    if (pivots.size < 2) simple
    else Gen.frequency(4 -> simple,
      1 -> Gen.pick(2, pivots).map { ps =>
        val Seq(a, b) = ps.toSeq.sortBy(_.toDouble)
        s"$qual${c.name} BETWEEN $a AND $b"
      })
  }

  private def tsPred(qual: String, c: Col, pools: Pools): Gen[String] =
    pools.times.get(c.name).filter(_.nonEmpty).fold(
      Gen.const(s"$qual${c.name} IS NOT NULL")) { pivots =>
      val cmp = for {
        p <- Gen.oneOf(pivots)
        op <- Gen.oneOf("<", "<=", ">", ">=")
      } yield s"$qual${c.name} $op ${lit(p)}"
      if (pivots.size < 2) cmp
      else Gen.frequency(3 -> cmp,
        1 -> Gen.pick(2, pivots).map { ps =>
          val Seq(a, b) = ps.toSeq.sorted
          s"$qual${c.name} BETWEEN ${lit(a)} AND ${lit(b)}"
        })
    }

  private def strPred(qual: String, c: Col, pools: Pools): Gen[String] = {
    val vals = pools.strings.getOrElse(c.name, Seq("x"))
    Gen.oneOf(
      Gen.oneOf(vals).map(v => s"$qual${c.name} = ${lit(v)}"),
      Gen.oneOf(vals).map(v => s"$qual${c.name} <> ${lit(v)}"),
      Gen.choose(1, math.min(3, vals.size)).flatMap(k =>
        Gen.pick(k, vals).map(vs =>
          s"$qual${c.name} IN (${vs.toSeq.sorted.map(lit).mkString(", ")})")))
  }

  private def colPred(qual: String, c: Col, pools: Pools): Gen[String] =
    c.typ match {
      case "string" => strPred(qual, c, pools)
      case "ts" => tsPred(qual, c, pools)
      case _ => numPred(qual, c, pools)
    }

  def predicate(qual: String, t: Table, pools: Pools): Gen[String] = for {
    n <- Gen.frequency(3 -> Gen.const(1), 2 -> Gen.const(2),
      1 -> Gen.const(3))
    conj <- Gen.oneOf(" AND ", " OR ")
    cols <- Gen.pick(math.min(n, t.cols.size), t.cols)
    preds <- Gen.sequence[Seq[String], String](
      cols.toSeq.map(c => colPred(qual, c, pools)))
  } yield preds.mkString(conj)

  // ---- aggregates -------------------------------------------------

  /** (expression, alias) pairs that are bit-stable on both engines. */
  private def aggExpr(qual: String, t: Table, i: Int): Gen[(String, String)] = {
    val nums = t.cols.filter(c => c.typ == "int" || c.typ == "long")
    val doubles = t.cols.filter(_.typ == "double")
    val strs = t.cols.filter(_.typ == "string")
    val opts = Seq.newBuilder[Gen[String]]
    opts += Gen.const("COUNT(*)")
    if (nums.nonEmpty) opts += Gen.oneOf(nums).flatMap(c => Gen.oneOf(
      s"CAST(SUM($qual${c.name}) AS BIGINT)",
      // exact-int sum then one division: bit-stable AVG on both engines
      s"(CAST(SUM($qual${c.name}) AS DOUBLE) / COUNT($qual${c.name}))",
      s"MIN($qual${c.name})", s"MAX($qual${c.name})",
      s"COUNT($qual${c.name})"))
    if (doubles.nonEmpty) opts += Gen.oneOf(doubles).flatMap(c =>
      Gen.oneOf(s"MIN($qual${c.name})", s"MAX($qual${c.name})"))
    if (strs.nonEmpty) opts += Gen.oneOf(strs).flatMap(c =>
      Gen.oneOf(s"MIN($qual${c.name})", s"MAX($qual${c.name})",
        s"COUNT(DISTINCT $qual${c.name})"))
    val os = opts.result()
    Gen.oneOf(os(0), os(1), os.drop(2): _*).map(e => (e, s"agg$i"))
  }

  // ---- scalar projections ----------------------------------------

  private def scalarExpr(qual: String, c: Col, i: Int,
                         pools: Pools = Pools(Map.empty, Map.empty))
      : Gen[(String, String)] =
    c.typ match {
      case "string" =>
        val base = Gen.oneOf(
          s"UPPER($qual${c.name})", s"LOWER($qual${c.name})",
          s"CAST(LENGTH($qual${c.name}) AS INTEGER)",
          s"SUBSTR($qual${c.name}, 1, 3)")
        val withCase = pools.strings.get(c.name).filter(_.nonEmpty).fold(base)(
          vs => Gen.frequency(3 -> base,
            1 -> Gen.oneOf(vs).map(v =>
              s"CASE WHEN $qual${c.name} = ${lit(v)} THEN 1 ELSE 0 END")))
        withCase.map(e => (e, s"x$i"))
      case "ts" => Gen.oneOf(
        s"CAST(EXTRACT(YEAR FROM $qual${c.name}) AS INTEGER)",
        s"CAST(EXTRACT(MONTH FROM $qual${c.name}) AS INTEGER)")
        .map(e => (e, s"x$i"))
      case "double" => Gen.oneOf(
        s"ABS($qual${c.name})",
        s"$qual${c.name} * 2").map(e => (e, s"x$i"))
      case _ =>
        val base = Gen.oneOf(
          s"$qual${c.name} + 1", s"$qual${c.name} % 7",
          s"$qual${c.name} * 3")
        val withCase = pools.numbers.get(c.name).filter(_.nonEmpty).fold(base)(
          ps => Gen.frequency(3 -> base,
            1 -> Gen.oneOf(ps).map(p =>
              s"CASE WHEN $qual${c.name} < $p THEN 0 ELSE 1 END")))
        withCase.map(e => (e, s"x$i"))
    }

  // ---- statement shapes ------------------------------------------

  private def orderAll(n: Int, dirGen: Gen[String]): Gen[String] =
    Gen.sequence[Seq[String], String](
      (1 to n).map(i => dirGen.map(d => s"$i $d")))
      .map(os => "ORDER BY " + os.mkString(", "))

  /** All four explicit direction × null-placement combinations: the
    * engines' DEFAULTS differ (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS
    * LAST), but an explicit directive must be honored identically —
    * including the two "unnatural" pairings (ASC NULLS LAST / DESC
    * NULLS FIRST) that neither engine would pick on its own.
    */
  private val dir: Gen[String] =
    Gen.oneOf("ASC NULLS FIRST", "ASC NULLS LAST",
      "DESC NULLS FIRST", "DESC NULLS LAST")

  /** Shape 1: filtered projection with deterministic LIMIT. */
  def filterProject(pools: Pools): Gen[String] = for {
    t <- Gen.oneOf(tables)
    k <- Gen.choose(1, t.cols.size)
    cols <- Gen.pick(k, t.cols)
    scalar <- Gen.option(Gen.oneOf(cols.toSeq))
    extra <- scalar.fold(Gen.const(Seq.empty[(String, String)]))(c =>
      scalarExpr("", c, 0, pools).map(Seq(_)))
    pred <- Gen.option(predicate("", t, pools))
    limit <- Gen.choose(1, 2000)
    proj = cols.map(_.name) ++ extra.map { case (e, a) => s"$e AS $a" }
    ord <- orderAll(proj.size, dir)
  } yield s"SELECT ${proj.mkString(", ")} FROM ${t.name}" +
    pred.fold("")(p => s" WHERE $p") + s" $ord LIMIT $limit"

  /** Shape 2: grouped aggregation (HAVING optional). */
  def groupBy(pools: Pools): Gen[String] = for {
    t <- Gen.oneOf(tables)
    gcands = t.cols.filter(c => c.typ == "string" || c.typ == "int")
    g <- if (gcands.nonEmpty) Gen.pick(1, gcands) else Gen.pick(1, t.cols)
    nAgg <- Gen.choose(1, 3)
    aggs <- Gen.sequence[Seq[(String, String)], (String, String)](
      (0 until nAgg).map(i => aggExpr("", t, i)))
    pred <- Gen.option(predicate("", t, pools))
    having <- Gen.option(Gen.choose(1, 50).map(c => s"COUNT(*) > $c"))
    gcols = g.map(_.name)
    proj = gcols ++ aggs.map { case (e, a) => s"$e AS $a" }
    ord <- orderAll(proj.size, dir)
  } yield s"SELECT ${proj.mkString(", ")} FROM ${t.name}" +
    pred.fold("")(p => s" WHERE $p") +
    s" GROUP BY ${gcols.mkString(", ")}" +
    having.fold("")(h => s" HAVING $h") + s" $ord"

  /** Shape 3: scalar aggregate (one row). */
  def scalarAgg(pools: Pools): Gen[String] = for {
    t <- Gen.oneOf(tables)
    nAgg <- Gen.choose(1, 4)
    aggs <- Gen.sequence[Seq[(String, String)], (String, String)](
      (0 until nAgg).map(i => aggExpr("", t, i)))
    pred <- Gen.option(predicate("", t, pools))
  } yield s"SELECT ${aggs.map { case (e, a) => s"$e AS $a" }.mkString(", ")}" +
    s" FROM ${t.name}" + pred.fold("")(p => s" WHERE $p")

  /** Shape 4: two-table join (projection or grouped). NO table
    * aliases: the whitelist's select_columns shape only admits
    * `[\w\s,]+` projections, and the TPC-H column prefixes make every
    * name globally unique anyway. A grouped join must LEAD with an
    * aggregate call so the `aggregate` prefix pattern admits it (a
    * paren-free projection prefix is impossible once aggs appear).
    */
  def join(pools: Pools): Gen[String] = for {
    jn <- Gen.oneOf(joins)
    (lt, lk, rt, rk) = jn
    l = tables.find(_.name == lt).get
    r = tables.find(_.name == rt).get
    grouped <- Gen.oneOf(true, false)
    pred <- Gen.option(Gen.oneOf(predicate("", l, pools),
      predicate("", r, pools)))
    sql <- if (grouped) for {
      gc <- Gen.oneOf(r.cols.filter(c => c.typ == "string" || c.typ == "int")
        .map(_.name) :+ rk)
      aggs <- Gen.sequence[Seq[(String, String)], (String, String)](
        (0 until 2).map(i => aggExpr("", l, i)))
      agg0 <- Gen.oneOf(s"COUNT(*)", s"MIN($lk)", s"MAX($lk)")
      proj = Seq(s"$agg0 AS agg") ++
        aggs.map { case (e, a) => s"$e AS $a" } ++ Seq(gc)
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} FROM $lt JOIN $rt" +
      s" ON $lk = $rk" + pred.fold("")(p => s" WHERE $p") +
      s" GROUP BY $gc $ord"
    else for {
      lc <- Gen.pick(2, l.cols)
      rc <- Gen.pick(1, r.cols)
      limit <- Gen.choose(1, 2000)
      proj = (lc.map(_.name) ++ rc.map(_.name)).distinct
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} FROM $lt JOIN $rt" +
      s" ON $lk = $rk" + pred.fold("")(p => s" WHERE $p") +
      s" $ord LIMIT $limit"
  } yield sql

  /** Three-table chains through the join graph: (t1, k1, t2, k2a,
    * k2b, t3, k3) with t1.k1 = t2.k2a and t2.k2b = t3.k3.
    */
  val chains: Seq[(String, String, String, String, String, String, String)] =
    Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "o_custkey",
        "customer", "c_custkey"),
      ("orders", "o_custkey", "customer", "c_custkey", "c_nationkey",
        "nation", "n_nationkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey", "n_regionkey",
        "region", "r_regionkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey", "n_regionkey",
        "region", "r_regionkey"))

  /** Shape 7: three-table join chain (grouped or projected). */
  def joinChain(pools: Pools): Gen[String] = for {
    ch <- Gen.oneOf(chains)
    (t1, k1, t2, k2a, k2b, t3, k3) = ch
    tab1 = tables.find(_.name == t1).get
    tab3 = tables.find(_.name == t3).get
    grouped <- Gen.oneOf(true, false)
    pred <- Gen.option(Gen.oneOf(predicate("", tab1, pools),
      predicate("", tab3, pools)))
    from = s"FROM $t1 JOIN $t2 ON $k1 = $k2a JOIN $t3 ON $k2b = $k3"
    sql <- if (grouped) for {
      gc <- Gen.oneOf(tab3.cols.filter(c => c.typ == "string" ||
        c.typ == "int").map(_.name) :+ k3)
      agg1 <- aggExpr("", tab1, 1)
      agg0 <- Gen.oneOf("COUNT(*)", s"MIN($k1)", s"MAX($k1)")
      proj = Seq(s"$agg0 AS agg") :+
        s"${agg1._1} AS ${agg1._2}" :+ gc
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} $from" +
      pred.fold("")(p => s" WHERE $p") + s" GROUP BY $gc $ord"
    else for {
      lc <- Gen.pick(2, tab1.cols)
      rc <- Gen.pick(1, tab3.cols)
      limit <- Gen.choose(1, 2000)
      proj = (lc.map(_.name) ++ rc.map(_.name)).distinct
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} $from" +
      pred.fold("")(p => s" WHERE $p") + s" $ord LIMIT $limit"
  } yield sql

  /** Type-aligned column pairs for set operations. */
  val setPairs: Seq[(String, String, String, String)] = Seq(
    ("customer", "c_nationkey", "supplier", "s_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "event_type", "events", "event_type"))

  /** Shape 8: INTERSECT / EXCEPT (set-distinct semantics on both
    * engines; UNION is token-blocked by the validator so it never
    * appears). Trailing ordinal ORDER BY binds the set-op result in
    * both dialects, and dedup makes the result deterministic.
    */
  def setOp(pools: Pools): Gen[String] = for {
    pr <- Gen.oneOf(setPairs)
    (lt, lc, rt, rc) = pr
    ltab = tables.find(_.name == lt).get
    rtab = tables.find(_.name == rt).get
    op <- Gen.oneOf("INTERSECT", "EXCEPT")
    lp <- Gen.option(predicate("", ltab, pools))
    rp <- if (lt == rt) predicate("", rtab, pools).map(Some(_))
          else Gen.option(predicate("", rtab, pools))
    d <- dir
  } yield s"SELECT $lc AS k FROM $lt" +
    lp.fold("")(p => s" WHERE $p") +
    s" $op SELECT $rc AS k FROM $rt" +
    rp.fold("")(p => s" WHERE $p") +
    s" ORDER BY 1 $d"

  /** Shape 5: DISTINCT projection. */
  def distinct(pools: Pools): Gen[String] = for {
    t <- Gen.oneOf(tables)
    cands = t.cols.filter(c => c.typ != "double" && c.typ != "ts")
    k <- Gen.choose(1, math.min(2, cands.size))
    cols <- Gen.pick(k, cands)
    pred <- Gen.option(predicate("", t, pools))
    ord <- orderAll(cols.size, dir)
  } yield s"SELECT DISTINCT ${cols.map(_.name).mkString(", ")}" +
    s" FROM ${t.name}" + pred.fold("")(p => s" WHERE $p") + s" $ord"

  /** Shape 6: ranking window over a unique ordering. */
  def window(pools: Pools): Gen[String] = for {
    // (table, UNIQUE key, partition col): the window's ORDER BY key
    // must be unique within each partition or ROW_NUMBER is
    // nondeterministic and the engines may legitimately disagree
    tkp <- Gen.oneOf(
      ("customer", "c_custkey", "c_mktsegment"),
      ("orders", "o_orderkey", "o_orderstatus"),
      ("supplier", "s_suppkey", "s_nationkey"),
      ("events", "event_id", "event_type"),
      ("part", "p_partkey", "p_brand"))
    (t, key, part) = tkp
    tab = tables.find(_.name == t).get
    fn <- Gen.oneOf("ROW_NUMBER()", "RANK()", "DENSE_RANK()",
      "COUNT(*)", s"MIN($key)")
    d <- dir
    pred <- Gen.option(predicate("", tab, pools))
    limit <- Gen.choose(10, 2000)
  // ROW_NUMBER/RANK/DENSE_RANK are INTEGER in Spark but BIGINT in
  // DuckDB — the CAST pins the one dtype delta this surface has
  } yield s"SELECT $key, $part, CAST($fn OVER " +
    s"(PARTITION BY $part ORDER BY $key $d) AS BIGINT) AS w FROM $t" +
    pred.fold("")(p => s" WHERE $p") +
    s" ORDER BY $key ASC NULLS FIRST LIMIT $limit"

  /** Null-safe aggregate pool for outer-join groups (no division). */
  private def outerSafeAgg(qual: String, t: Table, i: Int)
      : Gen[(String, String)] = {
    val nums = t.cols.filter(c => c.typ == "int" || c.typ == "long")
    val strs = t.cols.filter(_.typ == "string")
    val opts = Seq.newBuilder[Gen[String]]
    opts += Gen.const("COUNT(*)")
    if (nums.nonEmpty) opts += Gen.oneOf(nums).flatMap(c => Gen.oneOf(
      s"CAST(SUM($qual${c.name}) AS BIGINT)",
      s"MIN($qual${c.name})", s"MAX($qual${c.name})",
      s"COUNT($qual${c.name})"))
    if (strs.nonEmpty) opts += Gen.oneOf(strs).flatMap(c =>
      Gen.oneOf(s"MIN($qual${c.name})", s"MAX($qual${c.name})",
        s"COUNT(DISTINCT $qual${c.name})"))
    val os = opts.result()
    Gen.oneOf(os(0), os(1), os.drop(2): _*).map(e => (e, s"agg$i"))
  }

  /** Shape 9: LEFT / FULL outer join (projection or grouped). The
    * richest null-semantics surface the validator admits: null-extended
    * rows flow through predicates (NULL comparisons filter identically
    * in both dialects), aggregates (COUNT(col) skips nulls, SUM/MIN/MAX
    * ignore them — both engines ANSI here), and ordering (which is why
    * every key carries its explicit NULLS directive — the engines'
    * *defaults* differ, ASC NULLS FIRST in Spark vs NULLS LAST in
    * DuckDB, and an outer join is exactly where naked ASC diverges).
    * A WHERE predicate goes on the LEFT side only: a right-side
    * predicate on a LEFT join just deletes the null-extended rows
    * (valid but a degenerate inner join), while a left-side predicate
    * keeps the outer semantics observable.
    */
  def outerJoin(pools: Pools): Gen[String] = for {
    jn <- Gen.oneOf(joins)
    (lt, lk, rt, rk) = jn
    l = tables.find(_.name == lt).get
    r = tables.find(_.name == rt).get
    jt <- Gen.oneOf("LEFT JOIN", "FULL JOIN")
    grouped <- Gen.oneOf(true, false)
    pred <- Gen.option(predicate("", l, pools))
    sql <- if (grouped) for {
      gc <- Gen.oneOf(r.cols.filter(c => c.typ == "string" || c.typ == "int")
        .map(_.name) :+ rk)
      // no AVG-style division here: a group made ONLY of null-extended
      // rows has COUNT(col)=0, and x/0 is the one spot where ANSI
      // dialects may error instead of NULLing — COUNT/SUM/MIN/MAX over
      // a null-extended group are NULL/0 on both engines, no edge
      aggs <- Gen.sequence[Seq[(String, String)], (String, String)](
        (0 until 2).map(i => outerSafeAgg("", l, i)))
      agg0 <- Gen.oneOf("COUNT(*)", s"COUNT($lk)", s"MIN($lk)")
      proj = Seq(s"$agg0 AS agg") ++
        aggs.map { case (e, a) => s"$e AS $a" } ++ Seq(gc)
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} FROM $lt $jt $rt" +
      s" ON $lk = $rk" + pred.fold("")(p => s" WHERE $p") +
      s" GROUP BY $gc $ord"
    else for {
      lc <- Gen.pick(2, l.cols)
      rc <- Gen.pick(1, r.cols)
      limit <- Gen.choose(1, 2000)
      proj = (lc.map(_.name) ++ rc.map(_.name)).distinct
      ord <- orderAll(proj.size, dir)
    } yield s"SELECT ${proj.mkString(", ")} FROM $lt $jt $rt" +
      s" ON $lk = $rk" + pred.fold("")(p => s" WHERE $p") +
      s" $ord LIMIT $limit"
  } yield sql

  /** Shape 10: IN / EXISTS subquery predicates over the join graph.
    * [NOT] IN is restricted to the graph's KEY columns, which are
    * non-null in this corpus — NOT IN against a subquery that can
    * yield NULL is the classic three-valued-logic trap (the whole
    * result goes empty); both engines implement that standard
    * semantics, but pinning non-null keys keeps the fuzz signal on
    * dialect divergence rather than on a designed-in footgun.
    * EXISTS / NOT EXISTS use the same equality correlation Spark's
    * subquery decorrelation requires.
    */
  def subqueryPred(pools: Pools): Gen[String] = for {
    jn <- Gen.oneOf(joins)
    (lt, lk, rt, rk) = jn
    l = tables.find(_.name == lt).get
    r = tables.find(_.name == rt).get
    neg <- Gen.oneOf("", "NOT ")
    exists <- Gen.oneOf(true, false)
    innerPred <- Gen.option(predicate("", r, pools))
    outerPred <- Gen.option(predicate("", l, pools))
    k <- Gen.choose(1, math.min(3, l.cols.size))
    cols <- Gen.pick(k, l.cols)
    limit <- Gen.choose(1, 2000)
    proj = cols.map(_.name)
    ord <- orderAll(proj.size, dir)
    sub = if (exists)
      s"${neg}EXISTS (SELECT 1 FROM $rt WHERE $rk = $lk" +
        innerPred.fold("")(p => s" AND ($p)") + ")"
    else
      s"$lk ${neg}IN (SELECT $rk FROM $rt" +
        innerPred.fold("")(p => s" WHERE $p") + ")"
  } yield s"SELECT ${proj.mkString(", ")} FROM $lt WHERE $sub" +
    outerPred.fold("")(p => s" AND ($p)") + s" $ord LIMIT $limit"

  /** Shape 11: aggregate windows with explicit ROWS frames. The frame
    * surface is where dialect DEFAULTS diverge most (with an ORDER BY
    * and no frame, both engines use RANGE UNBOUNDED PRECEDING..CURRENT
    * ROW — but RANGE over ties vs ROWS is engine-visible the moment
    * the order key repeats), so every generated window pins an
    * explicit ROWS frame over a UNIQUE order key: deterministic on
    * both engines, and the int-SUM CAST pins DuckDB's HUGEINT
    * widening. FIRST_VALUE over a unique key with an explicit frame is
    * deterministic too (naked FIRST_VALUE over a tied order is not).
    */
  def windowFrame(pools: Pools): Gen[String] = for {
    tkp <- Gen.oneOf(
      ("customer", "c_custkey", "c_mktsegment", "c_nationkey"),
      ("orders", "o_orderkey", "o_orderstatus", "o_custkey"),
      ("supplier", "s_suppkey", "s_nationkey", "s_nationkey"),
      ("events", "event_id", "event_type", "user_id"),
      ("part", "p_partkey", "p_brand", "p_size"))
    (t, key, part, num) = tkp
    tab = tables.find(_.name == t).get
    d <- dir
    frame <- Gen.oneOf(
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING",
      "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING")
    // OVER binds to the bare function call; the single outer CAST pins
    // DuckDB's HUGEINT int-SUM widening and the COUNT width at once
    fn <- Gen.oneOf(
      s"SUM($num)",
      "COUNT(*)",
      s"MIN($key)", s"MAX($key)",
      s"FIRST_VALUE($key)")
    pred <- Gen.option(predicate("", tab, pools))
    limit <- Gen.choose(10, 2000)
  } yield s"SELECT $key, $part, CAST($fn OVER " +
    s"(PARTITION BY $part ORDER BY $key $d $frame) AS BIGINT) AS w FROM $t" +
    pred.fold("")(p => s" WHERE $p") +
    s" ORDER BY $key ASC NULLS FIRST LIMIT $limit"

  /** Shape 12: ROLLUP / CUBE / GROUPING SETS. The super-aggregate rows
    * carry NULL group keys in both dialects, and since every generated
    * group column is non-null in this corpus, a NULL key unambiguously
    * marks a subtotal row; CAST(GROUPING(col) AS INTEGER) pins the flag
    * dtype (Spark TINYINT vs DuckDB BIGINT) and makes the projection a
    * candidate key, so the all-columns NULLS-explicit ORDER BY is
    * total. This is exactly the null-group-labeling surface the
    * dialect-gap note in §5.2 flags and the fixed catalog entries
    * (q32/q33) pin only pointwise.
    */
  def rollupAgg(pools: Pools): Gen[String] = for {
    t <- Gen.oneOf(tables)
    gcands = t.cols.filter(c => c.typ == "string" || c.typ == "int")
    g <- if (gcands.size >= 2) Gen.pick(2, gcands)
         else Gen.pick(math.min(1, gcands.size), gcands)
    gcols = g.map(_.name).toSeq
    mode <- Gen.oneOf("ROLLUP", "CUBE", "GROUPING SETS")
    nAgg <- Gen.choose(1, 2)
    aggs <- Gen.sequence[Seq[(String, String)], (String, String)](
      (0 until nAgg).map(i => aggExpr("", t, i)))
    pred <- Gen.option(predicate("", t, pools))
    groupClause = mode match {
      case "GROUPING SETS" =>
        val sets = (gcols.indices.map(i =>
          s"(${gcols.take(i + 1).mkString(", ")})") :+ "()").mkString(", ")
        s"GROUPING SETS ($sets)"
      case m => s"$m(${gcols.mkString(", ")})"
    }
    flags = gcols.zipWithIndex.map { case (c, i) =>
      s"CAST(GROUPING($c) AS INTEGER) AS g$i" }
    proj = gcols ++ flags ++ aggs.map { case (e, a) => s"$e AS $a" }
    ord <- orderAll(proj.size, dir)
  } yield s"SELECT ${proj.mkString(", ")} FROM ${t.name}" +
    pred.fold("")(p => s" WHERE $p") +
    s" GROUP BY $groupClause $ord"

  /** Shape 13: scalar subquery in the SELECT list, correlated through
    * the join graph (outer = parent table, subquery aggregates the
    * child rows matching the outer key). COUNT(*) is BIGINT on both
    * engines; MIN/MAX of a key keep the column's own width; a
    * correlated empty group yields 0 / NULL identically — and the NULL
    * results are exactly what the four-way NULLS-explicit ORDER BY
    * then has to place deterministically.
    */
  def scalarSubquery(pools: Pools): Gen[String] = for {
    jn <- Gen.oneOf(joins)
    (lt, lk, rt, rk) = jn
    l = tables.find(_.name == lt).get
    r = tables.find(_.name == rt).get
    subAgg <- Gen.oneOf("COUNT(*)", s"MIN($lk)", s"MAX($lk)",
      s"COUNT($lk)")
    innerPred <- Gen.option(predicate("", l, pools))
    outerPred <- Gen.option(predicate("", r, pools))
    k <- Gen.choose(1, math.min(2, r.cols.size))
    cols <- Gen.pick(k, r.cols)
    limit <- Gen.choose(1, 2000)
    proj = cols.map(_.name).toSeq :+
      (s"(SELECT $subAgg FROM $lt WHERE $lk = $rk" +
        innerPred.fold("")(p => s" AND ($p)") + ") AS sq")
    ord <- orderAll(proj.size, dir)
  } yield s"SELECT ${proj.mkString(", ")} FROM $rt" +
    outerPred.fold("")(p => s" WHERE $p") + s" $ord LIMIT $limit"

  /** Shape 14: correlated scalar subquery with ORDER BY + LIMIT 1
    * (r9 advice: LIMIT inside correlated subqueries — a different
    * decorrelation path than the aggregate subqueries of shape 13:
    * Spark rewrites the LIMIT into a per-group ROW_NUMBER window, and
    * that rewrite's tie/null handling is exactly what this shape
    * differentially probes). Deterministic by construction: the
    * subquery SELECTS the column it orders by, so tied rows are
    * value-identical and the explicit NULLS directive pins the null
    * end; an empty correlation group yields NULL on both engines.
    */
  def limitSubquery(pools: Pools): Gen[String] = for {
    jn <- Gen.oneOf(joins)
    (lt, lk, rt, rk) = jn // child lt (fk lk) -> parent rt (key rk)
    l = tables.find(_.name == lt).get
    r = tables.find(_.name == rt).get
    sub <- Gen.oneOf(l.cols)
    sd <- dir
    innerPred <- Gen.option(predicate("", l, pools))
    outerPred <- Gen.option(predicate("", r, pools))
    k <- Gen.choose(1, math.min(2, r.cols.size))
    cols <- Gen.pick(k, r.cols)
    limit <- Gen.choose(1, 2000)
    proj = cols.map(_.name).toSeq :+
      (s"(SELECT ${sub.name} FROM $lt WHERE $lk = $rk" +
        innerPred.fold("")(p => s" AND ($p)") +
        s" ORDER BY ${sub.name} $sd LIMIT 1) AS sq")
    ord <- orderAll(proj.size, dir)
  } yield s"SELECT ${proj.mkString(", ")} FROM $rt" +
    outerPred.fold("")(p => s" WHERE $p") + s" $ord LIMIT $limit"

  /** Shape 15: ORDER BY over EXPRESSIONS, not ordinals (r9 advice).
    * The sort key is a computed expression that never appears in the
    * projection — both engines must evaluate it identically AND agree
    * on the resulting order. Total order is guaranteed by a trailing
    * unique-key tiebreaker, so expression ties (LENGTH over same-width
    * strings, % buckets) are exactly the surface being probed: a
    * comparison divergence reorders across tie groups and breaks the
    * row-wise value compare.
    */
  def orderByExpr(pools: Pools): Gen[String] = for {
    tk <- Gen.oneOf(
      ("customer", "c_custkey"), ("orders", "o_orderkey"),
      ("supplier", "s_suppkey"), ("events", "event_id"),
      ("part", "p_partkey"), ("nation", "n_nationkey"))
    (t, key) = tk
    tab = tables.find(_.name == t).get
    k <- Gen.choose(1, math.min(3, tab.cols.size))
    cols <- Gen.pick(k, tab.cols)
    oc <- Gen.oneOf(tab.cols)
    oexpr <- oc.typ match {
      case "string" => Gen.oneOf(s"LENGTH(${oc.name})",
        s"UPPER(${oc.name})", s"SUBSTR(${oc.name}, 2, 4)")
      case "ts" => Gen.oneOf(s"EXTRACT(MONTH FROM ${oc.name})",
        s"EXTRACT(YEAR FROM ${oc.name})")
      case "double" => Gen.oneOf(s"ABS(${oc.name})", s"0 - ${oc.name}")
      case _ => Gen.oneOf(s"${oc.name} % 7", s"0 - ${oc.name}",
        s"${oc.name} + 1")
    }
    d1 <- dir
    d2 <- dir
    pred <- Gen.option(predicate("", tab, pools))
    limit <- Gen.choose(1, 2000)
    proj = (cols.map(_.name).toSeq :+ key).distinct
  } yield s"SELECT ${proj.mkString(", ")} FROM $t" +
    pred.fold("")(p => s" WHERE $p") +
    s" ORDER BY $oexpr $d1, $key $d2 LIMIT $limit"

  /** The full admitted-surface generator. */
  def statement(pools: Pools): Gen[String] = Gen.frequency(
    3 -> filterProject(pools),
    3 -> groupBy(pools),
    2 -> scalarAgg(pools),
    3 -> join(pools),
    1 -> distinct(pools),
    2 -> window(pools),
    2 -> joinChain(pools),
    1 -> setOp(pools),
    2 -> outerJoin(pools),
    2 -> subqueryPred(pools),
    2 -> windowFrame(pools),
    2 -> rollupAgg(pools),
    2 -> scalarSubquery(pools),
    2 -> limitSubquery(pools),
    2 -> orderByExpr(pools))
}
