package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Serializable predicate specs — the engine's FilterChainStep.
 *
 * Reference: dynamic/filter/FilterChainStep.java:36-45 — a JVM interface
 * `filter(Message): Boolean` where **true means DROP** (inverse of SQL
 * WHERE), persisted as JSON (dynamic/JSON.java:42-93,
 * sideline/persistence/FilterChainStepSerializer.java) so sidelines survive
 * restarts.
 *
 * Spark-first redesign: instead of arbitrary JVM code evaluated row-by-row,
 * a spec is a small ADT that *compiles to a Catalyst `Column`*. That keeps
 * predicates inside whole-stage codegen, lets Catalyst push them into the
 * parquet/Kafka scan, and stays JSON-serializable for the control table.
 * Arbitrary-code steps (the reference's escape hatch) are still possible via
 * [[FilterSpec.Raw]] (a SQL expression string) — documented as the slow(er)
 * path only because it bypasses spec introspection, not codegen.
 *
 * DROP semantics are preserved: `spec.dropColumn` is true for rows the chain
 * removes; [[FilterChain.keep]] negates into a WHERE for the firehose and
 * un-negates for sideline replays (reference NegatingFilterChainStep.java:33-63).
 */
sealed trait FilterSpec extends Serializable {
  /** Column that evaluates TRUE when the row should be DROPPED. */
  def dropColumn: Column

  /** [[dropColumn]] with a NULL verdict coerced to false ("not dropped").
   * Both the firehose (negated) and the sideline replay (un-negated) must
   * agree on this coercion: under three-valued logic a NULL verdict would
   * exclude the row from both sides, breaking firehose ∪ sideline ≡ input.
   * This is the VALUE form (for annotation columns / metrics); in filter
   * context prefer [[keepColumn]] / [[sidelinedColumn]], which encode the
   * same truth table as AND/OR/IS NULL conjuncts that Catalyst can still
   * translate into parquet/Kafka source pushdown (coalesce() is not a
   * translatable source filter and would disable pushdown entirely). */
  def dropColumnNullSafe: Column = coalesce(dropColumn, lit(false))

  /** Filter-context keep predicate: true iff this step does NOT drop the
   * row (NULL verdict = keep). ≡ !dropColumnNullSafe, written as
   * (NOT p) OR (p IS NULL). Leaf specs override this to put the IS NULL
   * test on the FIELD attribute instead of the verdict expression —
   * Or(Not(In(f,…)), IsNull(f)) translates into a parquet/Kafka source
   * filter, while IsNull(<expression>) does not and would disable
   * pushdown of the whole disjunct. */
  def keepColumn: Column = { val p = dropColumn; !p || p.isNull }

  /** Filter-context sideline-replay predicate: true iff this step DOES
   * drop the row (NULL verdict = not dropped). ≡ dropColumnNullSafe,
   * written as p AND (p IS NOT NULL) so p itself remains pushdown-able. */
  def sidelinedColumn: Column = { val p = dropColumn; p && p.isNotNull }

  /** True when this spec applies as a JOIN, not a scalar predicate —
   * [[FilterSpec.KeyInTable]]. Join-backed specs must be TOP-LEVEL chain
   * steps (the reference's chain is a flat step map too,
   * dynamic/filter/FilterChain.java:37-43); their scalar accessors throw. */
  def joinBacked: Boolean = false

  /** DataFrame-transform form of "keep what this step does not drop".
   * Scalar specs filter on [[keepColumn]] (plan unchanged); join-backed
   * specs override with their join. */
  def applyKeep(df: DataFrame): DataFrame = df.filter(keepColumn)

  /** DataFrame-transform form of "only what this step drops" (the
   * sideline-replay side). */
  def applySidelined(df: DataFrame): DataFrame = df.filter(sidelinedColumn)

  /** Annotate `df` with a never-NULL boolean `as` = this step's drop
   * verdict — the firehose's routing/metrics column. */
  def annotateDrop(df: DataFrame, as: String): DataFrame =
    df.withColumn(as, dropColumnNullSafe)

  def toJson: String = JsonMethods.compact(JsonMethods.render(FilterSpec.toJValue(this)))
}

object FilterSpec {
  /** Drop when `key` (string column) is in the list — reference
   * sideline/recipes/trigger/KeyFilter.java:36-50. At 100 TB a huge
   * skip-list should become a broadcast anti-join instead; see
   * [[graft.ops.SkipList]]. */
  final case class KeyIn(field: String, keys: Seq[String]) extends FilterSpec {
    def dropColumn: Column = col(field).isin(keys: _*)
    // keys are non-null strings, so the verdict is NULL iff the field is
    override def keepColumn: Column = !dropColumn || col(field).isNull
  }

  /** Drop when `field` is in a TABLE-BACKED key list — the at-scale form
   * of [[KeyIn]] (r3/r4 verdict: a 1M-tenant skip-list must not become a
   * 1M-literal `isin`). The chain JSON carries only the parquet path; the
   * keys stream from storage into ONE broadcast exchange via
   * [[graft.ops.SkipList]]: `applyKeep` = broadcast LEFT ANTI join,
   * `applySidelined` = broadcast LEFT SEMI, `annotateDrop` = broadcast
   * left-outer + coalesce. NULL truth table matches [[KeyIn]] exactly
   * (NULL field: kept by the firehose, excluded from the replay —
   * proven against KeyIn in SkipListSuite).
   *
   * Join-backed: cannot compile to a scalar [[dropColumn]], so it must
   * sit as a top-level chain step (never nested in [[Not]]/[[AnyOf]]/
   * [[AllOf]]) and chains carrying it must be applied through the
   * DataFrame-transform path ([[FilterChain.applyKeep]] /
   * [[FilterChain.applySidelined]] / [[FilterChain.annotateDrop]] — the
   * engine's own call sites all do). */
  final case class KeyInTable(field: String, path: String) extends FilterSpec {
    private def list = graft.ops.SkipList(path)
    override def joinBacked: Boolean = true
    def dropColumn: Column = throw new UnsupportedOperationException(
      s"KeyInTable($field, $path) is join-backed and has no scalar Column form; " +
        "apply it as a top-level chain step via FilterChain.applyKeep/" +
        "applySidelined/annotateDrop, not nested inside Not/AnyOf/AllOf")
    override def applyKeep(df: DataFrame): DataFrame = list.antiJoin(df, col(field))
    override def applySidelined(df: DataFrame): DataFrame = list.semiJoin(df, col(field))
    override def annotateDrop(df: DataFrame, as: String): DataFrame =
      list.annotateMatch(df, col(field), as)
  }

  /** Drop when field == value — reference test NumberFilter (README.md:418-431). */
  final case class FieldEq(field: String, value: JValue) extends FilterSpec {
    def dropColumn: Column = col(field) === lit(jvalueToScala(value))
    override def keepColumn: Column =
      if (value == JNull) super.keepColumn
      else !dropColumn || col(field).isNull
  }

  /** Drop when field <op> value, op in lt/le/gt/ge. */
  final case class FieldCmp(field: String, op: String, value: JValue) extends FilterSpec {
    def dropColumn: Column = {
      val c = col(field); val v = lit(jvalueToScala(value))
      op match {
        case "lt" => c < v
        case "le" => c <= v
        case "gt" => c > v
        case "ge" => c >= v
        case other => throw new IllegalArgumentException(s"bad cmp op: $other")
      }
    }
    override def keepColumn: Column =
      if (value == JNull) super.keepColumn
      else !dropColumn || col(field).isNull
  }

  /** Drop when `field` matches the regex (unanchored find, Java syntax —
   * anchor with ^$ for full-match). The tenant-PATTERN recipe: the
   * reference's FilterChainStep is arbitrary JVM code and its README
   * filters on computed message traits; a regex over a field is the
   * declarative form that still reaches codegen. NULL field ⇒ NULL
   * verdict ⇒ kept by the firehose, excluded from the replay — the
   * [[KeyIn]] truth table. */
  final case class FieldRegex(field: String, pattern: String) extends FilterSpec {
    def dropColumn: Column = col(field).rlike(pattern)
    override def keepColumn: Column = !dropColumn || col(field).isNull
  }

  /** Logical NOT — the heart of sideline replay (process only what was
   * dropped). Reference: dynamic/filter/NegatingFilterChainStep.java:33-63. */
  final case class Not(inner: FilterSpec) extends FilterSpec {
    def dropColumn: Column = !inner.dropColumn
  }

  /** Drop if ANY inner spec drops. Balanced reduction — a wide disjunction
    * must not become a linear-depth tree (see [[FilterChain]]). */
  final case class AnyOf(steps: Seq[FilterSpec]) extends FilterSpec {
    def dropColumn: Column = balancedReduce(steps.map(_.dropColumn), _ || _)
  }

  /** Drop if ALL inner specs drop. Balanced like [[AnyOf]]. */
  final case class AllOf(steps: Seq[FilterSpec]) extends FilterSpec {
    def dropColumn: Column = balancedReduce(steps.map(_.dropColumn), _ && _)
  }

  /** Balanced pairwise reduction over columns: depth log2(n) instead of n
    * (Catalyst's converter/optimizer recursion overflows on linear-depth
    * trees at a few thousand nodes). */
  private[filter] def balancedReduce(
      cols: Seq[Column], op: (Column, Column) => Column): Column = {
    var level = cols
    while (level.size > 1)
      level = level.grouped(2).map {
        case Seq(a, b) => op(a, b)
        case Seq(a) => a
      }.toSeq
    level.head
  }

  /** Always drop — reference dynamic/filter/StaticMessageFilter.java:36-82. */
  case object DropAll extends FilterSpec { def dropColumn: Column = lit(true) }

  /** Never drop. */
  case object DropNone extends FilterSpec { def dropColumn: Column = lit(false) }

  /** Escape hatch: a raw SQL boolean expression with drop semantics. */
  final case class Raw(sql: String) extends FilterSpec {
    def dropColumn: Column = expr(sql)
  }

  private def jvalueToScala(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d
    case JBool(b)    => b
    case JNull       => null
    case other       => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private[filter] def toJValue(spec: FilterSpec): JValue = spec match {
    case KeyIn(f, ks) =>
      JObject("op" -> JString("key_in"), "field" -> JString(f),
        "keys" -> JArray(ks.map(JString(_)).toList))
    case KeyInTable(f, p) =>
      JObject("op" -> JString("key_in_table"), "field" -> JString(f),
        "path" -> JString(p))
    case FieldEq(f, v) =>
      JObject("op" -> JString("field_eq"), "field" -> JString(f), "value" -> v)
    case FieldCmp(f, op, v) =>
      JObject("op" -> JString("field_cmp"), "field" -> JString(f),
        "cmp" -> JString(op), "value" -> v)
    case FieldRegex(f, p) =>
      JObject("op" -> JString("field_regex"), "field" -> JString(f),
        "pattern" -> JString(p))
    case Not(i)    => JObject("op" -> JString("not"), "inner" -> toJValue(i))
    case AnyOf(ss) => JObject("op" -> JString("any"), "steps" -> JArray(ss.map(toJValue).toList))
    case AllOf(ss) => JObject("op" -> JString("all_of"), "steps" -> JArray(ss.map(toJValue).toList))
    case DropAll   => JObject("op" -> JString("all"))
    case DropNone  => JObject("op" -> JString("none"))
    case Raw(sql)  => JObject("op" -> JString("raw"), "sql" -> JString(sql))
  }

  def fromJson(json: String): FilterSpec = fromJValue(JsonMethods.parse(json))

  def fromJValue(v: JValue): FilterSpec = {
    def str(o: JObject, k: String): String = (o \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"expected string $k, got $other")
    }
    v match {
      case o: JObject =>
        str(o, "op") match {
          case "key_in" =>
            val keys = (o \ "keys") match {
              case JArray(xs) => xs.map { case JString(s) => s; case x => x.toString }
              case other => throw new IllegalArgumentException(s"bad keys: $other")
            }
            KeyIn(str(o, "field"), keys)
          case "key_in_table" => KeyInTable(str(o, "field"), str(o, "path"))
          case "field_eq"  => FieldEq(str(o, "field"), o \ "value")
          case "field_cmp" => FieldCmp(str(o, "field"), str(o, "cmp"), o \ "value")
          case "field_regex" => FieldRegex(str(o, "field"), str(o, "pattern"))
          case "not"       => Not(fromJValue(o \ "inner"))
          case "any"       => AnyOf(steps(o))
          case "all_of"    => AllOf(steps(o))
          case "all"       => DropAll
          case "none"      => DropNone
          case "raw"       => Raw(str(o, "sql"))
          case other       => throw new IllegalArgumentException(s"unknown op: $other")
        }
      case other => throw new IllegalArgumentException(s"expected object, got $other")
    }
  }

  private def steps(o: JObject): Seq[FilterSpec] = (o \ "steps") match {
    case JArray(xs) => xs.map(fromJValue)
    case other => throw new IllegalArgumentException(s"bad steps: $other")
  }
}
