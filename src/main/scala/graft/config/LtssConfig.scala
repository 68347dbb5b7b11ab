package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine configuration, mirroring the reference's CONFIG_SCHEMA
  * (custom_components/ltss/__init__.py:55-67, README.md:59-101):
  * `db_url` (required), `chunk_time_interval` (µs, default 30 days),
  * include/exclude filter with `domains`, `entities`, `entity_globs`.
  */
final case class FilterSpec(
    domains: Seq[String] = Nil,
    entities: Seq[String] = Nil,
    entityGlobs: Seq[String] = Nil,
) {
  def isEmpty: Boolean = domains.isEmpty && entities.isEmpty && entityGlobs.isEmpty
}

final case class LtssConfig(
    dbUrl: String = "",
    /** Time-partition ("chunk") width in microseconds; default 30 days
      * (reference __init__.py:60-62, 2_592_000_000_000 µs). */
    chunkTimeIntervalUs: Long = LtssConfig.DefaultChunkUs,
    include: FilterSpec = FilterSpec(),
    exclude: FilterSpec = FilterSpec(),
    /** Analog of PostGIS presence (reference __init__.py:303-328). */
    enableLocation: Boolean = true,
)

object LtssConfig {
  val DefaultChunkUs: Long = 2592000000000L // 30 days (µs)
}

/** Include/exclude entity filtering with Home Assistant semantics
  * (reference __init__.py:76 `convert_include_exclude_filter`; behavior
  * documented in README.md:71-101).
  *
  * Decision order (HA `EntityFilter` semantics):
  *   - excluded by exact entity / glob / domain loses to an *explicit*
  *     include at higher granularity;
  *   - granularity order: exact entity > glob > domain;
  *   - with only includes: anything not included is dropped;
  *   - with only excludes: anything not excluded is kept;
  *   - with both: include-first — an entity passes if included at any
  *     level and not excluded at an equal-or-finer level that wins.
  *
  * Implemented both as a pure Scala predicate (unit parity with the
  * reference) and as a Catalyst [[Column]] so the predicate participates
  * in pushdown / codegen on the DataFrame path.
  */
final class EntityFilter(include: FilterSpec, exclude: FilterSpec) extends Serializable {

  private val incEntities = include.entities.toSet
  private val excEntities = exclude.entities.toSet
  private val incDomains = include.domains.toSet
  private val excDomains = exclude.domains.toSet
  private val incGlobRes = include.entityGlobs.map(EntityFilter.globToRegex)
  private val excGlobRes = exclude.entityGlobs.map(EntityFilter.globToRegex)
  private val incGlobPatterns = incGlobRes.map(_.r)
  private val excGlobPatterns = excGlobRes.map(_.r)

  private def domainOf(entityId: String): String = {
    val i = entityId.indexOf('.')
    if (i < 0) entityId else entityId.substring(0, i)
  }

  private val haveInc = !include.isEmpty
  private val haveExc = !exclude.isEmpty

  /** Pure-Scala predicate (exact HA semantics, used in tests + streaming). */
  def accepts(entityId: String): Boolean = {
    val d = domainOf(entityId)
    val incE = incEntities.contains(entityId)
    val excE = excEntities.contains(entityId)
    val incG = incGlobPatterns.exists(_.pattern.matcher(entityId).matches())
    val excG = excGlobPatterns.exists(_.pattern.matcher(entityId).matches())
    val incD = incDomains.contains(d)
    val excD = excDomains.contains(d)

    if (!haveInc && !haveExc) true
    else if (haveInc && !haveExc) incE || incG || incD
    else if (!haveInc && haveExc) !(excE || excG || excD)
    else {
      // both: HA include/exclude precedence (finer include wins over
      // coarser exclude; explicit exclude at same granularity wins)
      if (incE) !excE
      else if (excE) false
      else if (incG) !excG
      else if (excG) false
      else if (incD || incG) !excG
      else if (incDomains.nonEmpty || incGlobRes.nonEmpty) false
      else !(excD || excG)
    }
  }

  /** The same predicate as a Catalyst Column over `entity_id` — stays in
    * whole-stage codegen (isin / rlike / split), no UDF. */
  def column(entityId: Column): Column = {
    val d = split(entityId, "\\.").getItem(0)
    def anyGlob(res: Seq[String]): Column =
      res.map(r => entityId.rlike("^(?:" + r + ")$")).reduceOption(_ || _).getOrElse(lit(false))
    val incE = if (incEntities.nonEmpty) entityId.isInCollection(incEntities) else lit(false)
    val excE = if (excEntities.nonEmpty) entityId.isInCollection(excEntities) else lit(false)
    val incG = anyGlob(incGlobRes)
    val excG = anyGlob(excGlobRes)
    val incD = if (incDomains.nonEmpty) d.isInCollection(incDomains) else lit(false)
    val excD = if (excDomains.nonEmpty) d.isInCollection(excDomains) else lit(false)

    if (!haveInc && !haveExc) lit(true)
    else if (haveInc && !haveExc) incE || incG || incD
    else if (!haveInc && haveExc) !(excE || excG || excD)
    else {
      when(incE, !excE)
        .when(excE, lit(false))
        .when(incG, !excG)
        .when(excG, lit(false))
        .when(incD, !excG)
        .otherwise(
          if (incDomains.nonEmpty || incGlobRes.nonEmpty) lit(false) else !(excD || excG))
    }
  }
}

object EntityFilter {
  def apply(cfg: LtssConfig): EntityFilter = new EntityFilter(cfg.include, cfg.exclude)

  /** fnmatch-style glob → anchored Java regex (reference uses Python
    * `fnmatch` via HA's glob filter; `*` and `?` wildcards, `[seq]` classes). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val j = glob.indexOf(']', i + 1)
          if (j > i) { // char class passes through (fnmatch semantics)
            val inner = glob.substring(i + 1, j)
            val cls = if (inner.startsWith("!")) "[^" + inner.substring(1) + "]" else "[" + inner + "]"
            sb.append(cls); i = j
          } else sb.append("\\[")
        case c if "\\.^$+{}()|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
