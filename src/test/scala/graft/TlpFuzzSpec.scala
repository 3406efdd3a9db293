package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed

/** Metamorphic fuzzing via Ternary Logic Partitioning (Rigger & Su,
  * "Finding Logic Bugs in DBMS via Query Partitioning", OOPSLA 2020 —
  * the SQLancer TLP oracle): for any query Q and predicate p,
  *
  *   Q  ≡  Q[p] ⊎ Q[NOT p] ⊎ Q[p IS NULL]
  *
  * as multisets, because SQL's three-valued WHERE keeps exactly the
  * true / the false-negated / the null rows. No second engine is
  * needed: the invariant is checked WITHIN each lane, so it catches
  * bugs the differential lane ([[FuzzParitySpec]]) cannot — a miscompiled
  * predicate both configurations share, a null-semantics error in a
  * shared rewrite, a partition-dependent filter result.
  *
  * Shapes: plain filter/projection, aggregation (the same aggregate run
  * over the base rows vs over the UNION ALL of the three partitions —
  * exact for count/min/max/decimal-sum/count-distinct), equi-join, and
  * a projection through the graft hstore/jsonpath kernels (row-local,
  * so TLP holds verbatim). Each case asserts on BOTH lanes (stock
  * codegen + graft rules/interpreted). 5 properties × 125 cases = 625
  * generated invariant checks.
  */
object TlpFuzzSpec extends Properties("TlpFuzz") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(125)
      .withInitialSeed(Seed(20260813L))

  // partition predicates lean on the fixture's nastiest semantics:
  // nullable k2/v/d/s, NaN/Inf in v, <=> vs =, LIKE over %_%
  private val numCol = Gen.oneOf("k1", "k2", "v", "d", "id")
  private val numConst = Gen.oneOf("0", "7", "-1", "0.5",
    "9999999999.99", "-0.01", "double('NaN')", "double('Infinity')",
    "NULL")
  private val cmp = Gen.oneOf("<", "<=", "=", ">=", ">", "<>", "<=>")

  private def atom: Gen[String] = Gen.frequency(
    5 -> (for { a <- numCol; op <- cmp; b <- numConst }
      yield s"($a $op $b)"),
    3 -> (for { a <- numCol; b <- numCol; op <- cmp }
      yield s"($a $op $b)"),
    2 -> Gen.oneOf("(s LIKE 's1%')", "(s LIKE '%_%')", "(s = '')",
      "(s <=> NULL)", "(s IN ('s1', 's2', 'café'))"),
    1 -> (for { a <- numCol; xs <- Gen.listOfN(3, numConst) }
      yield s"($a IN (${xs.mkString(", ")}))"))

  private def pred(depth: Int): Gen[String] =
    if (depth <= 0) atom
    else Gen.frequency(
      3 -> atom,
      2 -> (for { l <- pred(depth - 1); r <- pred(depth - 1) }
        yield s"($l AND $r)"),
      2 -> (for { l <- pred(depth - 1); r <- pred(depth - 1) }
        yield s"($l OR $r)"),
      1 -> pred(depth - 1).map(x => s"(NOT $x)"))

  /** `src` must embed exactly one `%s` hole for the WHERE clause. */
  private def tlp(src: String, p: String): Prop = {
    val full = src.format("true")
    val parts =
      s"""${src.format(s"($p)")}
         |UNION ALL ${src.format(s"(NOT ($p))")}
         |UNION ALL ${src.format(s"(($p) IS NULL)")}""".stripMargin
    Seq(FuzzLanes.stock -> "stock", FuzzLanes.graft -> "graft").map {
      case (lane, name) =>
        val a = FuzzLanes.rows(lane, full)
        val b = FuzzLanes.rows(lane, parts)
        (a == b) :| {
          s"lane $name violated TLP\npredicate: $p\nquery: $full\n" +
            s"full-only: ${a.diff(b).take(3)}\n" +
            s"parts-only: ${b.diff(a).take(3)}\nsizes: ${a.size} vs ${b.size}"
        }
    }.reduce(_ && _)
  }

  property("TLP: filter/projection") = Prop.forAll(pred(2)) { p =>
    tlp("SELECT id, k1, k2, v, d, s FROM f WHERE %s", p)
  }

  property("TLP: aggregation over the partition union") =
    Prop.forAll(for { p <- pred(2); g <- Gen.oneOf("k1 % 4", "k2", "s") }
      yield (p, g)) { case (p, g) =>
      // ScalaCheck shrinking degrades tuple members to "" — not a legal
      // SQL fragment; pass vacuously so shrink attempts don't error
      if (p.isEmpty || g.isEmpty) Prop.passed
      else {
      // agg(base) == agg(union of the three partitions): exact for
      // count/min/max/decimal-sum/count-distinct (no double sums)
      def agg(where: String) =
        s"""SELECT $g AS gk, count(*) AS n, sum(d) AS sd, min(v) AS mv,
           |max(v) AS xv, count(DISTINCT k2) AS cd
           |FROM (SELECT * FROM f WHERE $where) GROUP BY gk""".stripMargin
      val full = agg("true")
      val parts =
        s"""SELECT $g AS gk, count(*) AS n, sum(d) AS sd, min(v) AS mv,
           |max(v) AS xv, count(DISTINCT k2) AS cd FROM (
           |  SELECT * FROM f WHERE ($p)
           |  UNION ALL SELECT * FROM f WHERE (NOT ($p))
           |  UNION ALL SELECT * FROM f WHERE (($p) IS NULL)
           |) GROUP BY gk""".stripMargin
      Seq(FuzzLanes.stock -> "stock", FuzzLanes.graft -> "graft").map {
        case (lane, name) =>
          val a = FuzzLanes.rows(lane, full)
          val b = FuzzLanes.rows(lane, parts)
          (a == b) :| s"lane $name violated agg-TLP for $p\n" +
            s"full: ${a.take(3)}\nparts: ${b.take(3)}"
      }.reduce(_ && _)
      }
    }

  // r13b: the agg-TLP shape over a JOIN output — the partition union
  // runs through the graft lane's EagerAgg/OrExpansion rewrites (an
  // aggregate over a UNION ALL of filtered joins is exactly the shape
  // PushJoinBelowUnionAll + EagerAgg rearrange), so this catches a
  // rule that breaks bag semantics under three-valued filtering even
  // if both engine lanes share it.
  property("TLP: aggregation over a join's partition union") =
    Prop.forAll(for { p <- pred(1); g <- Gen.oneOf("b.k % 3", "f.k2") }
      yield (p, g)) { case (p, g) =>
      if (p.isEmpty || g.isEmpty) Prop.passed
      else {
      def agg(where: String) =
        s"""SELECT $g AS gk, count(*) AS n, sum(f.d) AS sd, min(f.v) AS mv,
           |count(DISTINCT f.k1) AS cd
           |FROM f JOIN b ON f.k1 = b.k WHERE $where GROUP BY gk""".stripMargin
      val full = agg("true")
      val parts =
        s"""SELECT gk, count(*) AS n, sum(sd0) AS sd, min(mv0) AS mv,
           |count(DISTINCT cd0) AS cd FROM (
           |  SELECT $g AS gk, f.d AS sd0, f.v AS mv0, f.k1 AS cd0
           |  FROM f JOIN b ON f.k1 = b.k WHERE ($p)
           |  UNION ALL SELECT $g, f.d, f.v, f.k1
           |  FROM f JOIN b ON f.k1 = b.k WHERE (NOT ($p))
           |  UNION ALL SELECT $g, f.d, f.v, f.k1
           |  FROM f JOIN b ON f.k1 = b.k WHERE (($p) IS NULL)
           |) GROUP BY gk""".stripMargin
      Seq(FuzzLanes.stock -> "stock", FuzzLanes.graft -> "graft").map {
        case (lane, name) =>
          val a = FuzzLanes.rows(lane, full)
          val b = FuzzLanes.rows(lane, parts)
          (a == b) :| s"lane $name violated join-agg-TLP for $p\n" +
            s"full: ${a.take(3)}\nparts: ${b.take(3)}"
      }.reduce(_ && _)
      }
    }

  property("TLP: equi-join with mixed-side predicate") =
    Prop.forAll(for {
      p <- pred(1)
      mixed <- Gen.oneOf("f.v > b.lo", "f.d <> b.w", "f.k2 <=> b.k",
        "f.v <= b.hi")
    } yield (p, mixed)) { case (p, mixed) =>
      tlp("SELECT f.id, b.k, b.w FROM f JOIN b ON f.k1 = b.k " +
        s"WHERE (($mixed) OR ($mixed) IS NULL OR NOT ($mixed)) AND %s", p)
    }

  property("TLP: graft hstore/jsonpath projection") =
    Prop.forAll(pred(2)) { p =>
      tlp(
        """SELECT id,
          |  hstore_to_json_loose(hstore_parse(concat(
          |    'a=>"', regexp_replace(coalesce(s, 'NULL'), '"', ''),
          |    '", b=>', coalesce(cast(k2 AS string), 'NULL')))) AS hs,
          |  get_json_object(to_json(named_struct(
          |    'a', s, 'b', named_struct('c', k1, 'd', v))), '$.b.d') AS jp
          |FROM f WHERE %s""".stripMargin, p)
    }
}
