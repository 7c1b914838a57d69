package graft.operators

import graft.model.{DatasetConfig, Naming}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import scala.util.matching.Regex

/**
 * The reference's four restructuring operators as `DataFrame => DataFrame`
 * transforms (SURVEY.md §7.3). All are shuffle-minimal:
 *
 *  - [[NormalizeColumns]] / [[MissingValues]] / [[ValueCleaning]] are pure
 *    projections (zero shuffle, stay inside WholeStageCodegen);
 *  - [[AggregatorPivot]] is schema-driven (the regex classification runs
 *    driver-side over `df.columns`; the pivot itself is a projection);
 *  - [[GroupByNest]] is a single hash aggregation on the group keys;
 *  - [[EmbedJoin]] is a pre-aggregated left join, broadcast when the child
 *    side is small (the common case — embed children are dimension-like).
 *
 * Row-order preservation (reference semantics depend on CSV row order,
 * ref: wstlr/extractor.py:62-88) is made explicit with a `_rid` column;
 * at 100 TB the `_rid` is only materialized when order actually matters
 * (grouped tables), never as a global sort.
 */
object Restructure {
  /** Internal row-id column used for order preservation. */
  val RowId = "_rid"

  /** Backtick-quote an identifier for splicing into generated lambda SQL
   *  (hyphens, keywords, spaces all survive normalization paths). */
  def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Attach a monotonically increasing row id capturing encounter order.
   *  Not contiguous across partitions, but monotone w.r.t. file/row order
   *  for file sources — exactly what first-seen-order semantics need. */
  def withRowId(df: DataFrame): DataFrame =
    if (df.columns.contains(RowId)) df
    else df.withColumn(RowId, monotonically_increasing_id())
}

/**
 * Column-name normalization (ref: wstlr/__init__.py:153-161 applied to CSV
 * headers at wstlr/extractor.py:151-153). Schema-level rename — zero cost,
 * no data movement.
 */
object NormalizeColumns {
  def apply(df: DataFrame): DataFrame = {
    val renamed = df.columns.map(Naming.fixFieldName)
    require(renamed.distinct.length == renamed.length,
      s"Column-name normalization caused a collision: ${renamed.mkString(",")}")
    df.toDF(renamed.toIndexedSeq: _*)
  }
}

/**
 * Missing-value sentinels -> null (ref: wstlr/extractor.py:209,226-228;
 * default list "NA", "", "Not Provided"). Pure projection.
 */
object MissingValues {
  def apply(df: DataFrame, missing: Seq[String] = Naming.DefaultMissing,
            columns: Seq[String] = Nil): DataFrame = {
    val target = if (columns.nonEmpty) columns else df.columns.toSeq
    val exprs = df.columns.map { c =>
      if (target.contains(c))
        when(col(c).isin(missing.map(lit): _*), lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }
    df.select(exprs.toIndexedSeq: _*)
  }
}

/** Value cleaning: `;\s+` -> `;`, trim (ref: wstlr/__init__.py:143-150;
 *  `\s+` as in the reference and `Naming.cleanValues` — not just spaces,
 *  so a tab/newline after ';' collapses identically on every path). */
object ValueCleaning {
  def clean(c: Column): Column = regexp_replace(trim(c), ";\\s+", ";")

  def apply(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(c, clean(col(c))))
}

/**
 * Aggregator column pivot (ref: wstlr/extractor.py:100-127,160-187):
 * config maps new-column -> regex; every source column matching a regex
 * (case-insensitive, first matching aggregator wins) is removed and folded
 * into the new array<struct<code,value[,text]>> column. `aggregatorSplitter`
 * strips a leading prefix off the code; `varnameLookup` may remap both the
 * new column name and per-variable codes (key "newcol:varname").
 *
 * Entirely schema-driven: regex classification happens on the driver over
 * `df.columns`; the data-side transform is one projection (no shuffle, no
 * UDF, codegen-friendly).
 */
object AggregatorPivot {

  /** Classify columns (ref: AggregateColumns, extractor.py:107-127).
   *  Returns (standard columns in order, newcol -> matched columns in order). */
  def classify(aggregators: Seq[(String, Regex)], columns: Seq[String])
      : (Seq[String], Seq[(String, Seq[String])]) = {
    val matched = columns.map { c =>
      c -> aggregators.collectFirst { case (newcol, rgx) if rgx.findFirstIn(c).isDefined => newcol }
    }
    val standard = matched.collect { case (c, None) => c }
    val agg = aggregators.map { case (newcol, _) =>
      newcol -> matched.collect { case (c, Some(n)) if n == newcol => c }
    }.filter(_._2.nonEmpty)
    (standard, agg)
  }

  def compile(aggregators: Map[String, String]): Seq[(String, Regex)] =
    aggregators.toSeq.map { case (newcol, pattern) => newcol -> s"(?i)$pattern".r.unanchored }

  def apply(
      df: DataFrame,
      aggregators: Map[String, String],
      aggSplitter: Option[String] = None,
      codeDetails: Map[String, String] = Map.empty,
      varnameLookup: Map[String, String] = Map.empty): DataFrame = {
    if (aggregators.isEmpty) return df
    val (standard, aggregated) = classify(compile(aggregators), df.columns.toSeq)

    val standardCols = standard.map(col)
    val aggCols = aggregated.map { case (newcol, vars) =>
      val outName = varnameLookup.getOrElse(newcol, newcol)
      val entries = vars.map { v =>
        // aggregator-splitter strips the prefix before the first splitter
        // occurrence (ref: extractor.py:174-178)
        val codeVar = aggSplitter match {
          case Some(s) if v.contains(s) => v.split(Regex.quote(s), -1).drop(1).mkString(s)
          case _ => v
        }
        // the per-variable key uses the POST-substitution column name
        // (ref: extractor.py:168-180: varidentifier = f"{newcol}:{varname}"
        // after newcol itself was remapped) — DD lookups key on varnames
        val code = varnameLookup.getOrElse(s"$outName:$codeVar", codeVar)
        // when any matched column carries a text detail, every entry gets
        // the field (null where absent) — array() requires a uniform
        // struct type, unlike the reference's heterogeneous JSON dicts
        val fields = Seq(lit(code).as("code"), col(v).as("value")) ++
          (if (codeDetails.nonEmpty)
            Seq(codeDetails.get(v).map(lit).getOrElse(lit(null).cast("string")).as("text"))
          else Nil)
        struct(fields: _*)
      }
      array(entries: _*).as(outName)
    }
    df.select((standardCols ++ aggCols).toIndexedSeq: _*)
  }
}

/**
 * `_display` derived columns (ref: wstlr/extractor.py:189-191): for every
 * standard column whose *value* appears in the harmony display map, add
 * `<col>_display`. Implemented as a broadcast map literal lookup — pure
 * projection, no join, no shuffle.
 */
object DisplayColumns {
  def apply(df: DataFrame, codeDetails: Map[String, String],
            columns: Seq[String] = Nil): DataFrame = {
    if (codeDetails.isEmpty) return df
    val lookup = map(codeDetails.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val target = if (columns.nonEmpty) columns else df.columns.toSeq
    // Map keys are strings; cast the probe column so non-string columns
    // (e.g. integer codes) resolve instead of failing analysis.
    target.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_display", element_at(lookup, col(c).cast("string")))
    }
  }
}

/**
 * Join-based `_display` columns: the scale-safe sibling of
 * [[DisplayColumns]] — the code->display dimension rides a broadcast
 * left join instead of a driver-collected map, so the same idiom works
 * whether the dimension has 25 rows or 25 million. Use [[DisplayColumns]]
 * only for maps that are already driver-side (harmony display maps).
 */
object DisplayJoin {
  def apply(df: DataFrame, dim: DataFrame, column: String,
            codeCol: String, displayCol: String): DataFrame = {
    val d = dim.select(
      col(codeCol).cast("string").as("__code"),
      col(displayCol).as("__display"))
    df.join(broadcast(d), col(column).cast("string") === col("__code"), "left")
      .withColumn(s"${column}_display", col("__display"))
      .drop("__code", "__display")
  }
}

/**
 * Order-preserving group-by nesting (ref: wstlr/extractor.py:48-97):
 * rows sharing the group_by key columns nest under a `content` array of the
 * non-key columns; first-seen key order and intra-group row order preserved.
 *
 * Spark shape: one hash aggregation — `collect_list` of (rid, payload)
 * sorted per group, plus `min(rid)` as the group-order key. The global
 * `orderBy(_gid)` is only applied when `ordered=true` (needed for the
 * compatibility JSON doc; at 100 TB keep `ordered=false` and sort only at
 * the final single-file write).
 */
object GroupByNest {
  def apply(df: DataFrame, groupByConfig: String, ordered: Boolean = false): DataFrame = {
    val keys = groupByConfig.split(",").map(k => Naming.fixFieldName(k.trim)).toSeq
    val withRid = Restructure.withRowId(df)
    // a pre-attached _rid stays the sort key but never leaks into content
    val payloadCols = df.columns
      .filterNot(c => keys.contains(c) || c == Restructure.RowId).toSeq
    val payload = struct((col(Restructure.RowId) +: payloadCols.map(col)).toIndexedSeq: _*)
    val grouped = withRid
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(
        sort_array(collect_list(payload)).as("_sorted"),
        min(col(Restructure.RowId)).as("_gid"))
      .withColumn("content",
        expr(s"transform(_sorted, x -> struct(${payloadCols.map(c => s"x.${Restructure.quoted(c)} as ${Restructure.quoted(c)}").mkString(", ")}))"))
      .drop("_sorted")
    val shaped = grouped.select((keys.map(col) :+ col("content") :+ col("_gid")).toIndexedSeq: _*)
    (if (ordered) shaped.orderBy(col("_gid")) else shaped).drop("_gid")
  }
}

/**
 * Embed join (ref: wstlr/embedable.py + probe at wstlr/extractor.py:353-366):
 * child-table rows become an array column on the parent named after the
 * child table; each child row is tagged `table_name`; missing key -> []
 * (left-outer). The reference builds an in-RAM hash of the whole child —
 * the Spark shape is the same idea done scalably: pre-aggregate the child
 * with `collect_list`, then a left join that Catalyst turns into a
 * broadcast hash join when the nested child is small. By default the join
 * strategy is left to Catalyst/AQE (size-estimated); pass
 * `hintBroadcast = true` only when the caller knows the child is a
 * bounded dimension — an unconditional hint on an unbounded child plus
 * unbounded per-key `collect_list` groups would OOM at scale.
 *
 * Compound keys are comma-separated colnames (ref: project_config.md:79-96).
 */
object EmbedJoin {
  def apply(
      parent: DataFrame,
      child: DataFrame,
      childTableName: String,
      joinColname: String,
      hintBroadcast: Boolean = false,
      preserveOrder: Boolean = true,
      saltBuckets: Int = 1): DataFrame = {
    // a broadcast join never shuffles the parent, so a hot key has no
    // single-task funnel to salt away — requesting both is a confusion
    require(saltBuckets == 1 || !hintBroadcast,
      "saltBuckets applies to the shuffle join path; drop hintBroadcast to salt")
    val keys = joinColname.split(",").map(k => Naming.fixFieldName(k.trim)).toSeq
    keys.foreach { k =>
      require(child.columns.contains(k),
        s"Unable to join on column name: '$k'. Columns: ${child.columns.mkString(", ")}")
      require(parent.columns.contains(k),
        s"Embed parent missing join column '$k'. Columns: ${parent.columns.mkString(", ")}")
    }
    val childRid = Restructure.withRowId(child)
    val childCols = child.columns.toSeq.filterNot(_ == Restructure.RowId)
    val rowStruct = struct(
      (col(Restructure.RowId) +:
        lit(childTableName).as("table_name") +:
        childCols.map(col)).toIndexedSeq: _*)
    val shape = s"x -> struct(x.table_name as table_name, ${childCols.map(c => s"x.${Restructure.quoted(c)} as ${Restructure.quoted(c)}").mkString(", ")})"
    val collected =
      if (preserveOrder) sort_array(collect_list(rowStruct))
      else collect_list(rowStruct)
    val nested = childRid
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(collected.as("_sorted"))
      .withColumn("_nested", expr(s"transform(_sorted, $shape)"))
      .select((keys.map(col) :+ col("_nested")).toIndexedSeq: _*)
    val right = if (hintBroadcast) broadcast(nested) else nested
    // salt opt-in (SURVEY.md §7 "salt skewed embed keys"): the nested
    // child is one row per key, so replicating it `saltBuckets`x is
    // cheap while a hot parent key spreads over that many tasks
    val joined =
      if (saltBuckets > 1) SkewJoin.saltedJoin(parent, nested, keys, "left", saltBuckets)
      else parent.join(right, keys, "left")
    joined
      .withColumn(childTableName, coalesce(col("_nested"), array()))
      .drop("_nested")
  }
}

/**
 * Run-length "group by adjacent code" (ref: wstlr/conceptmap.py:455-469):
 * BuildConceptMap emits a new element whenever the code differs from the
 * previous row's — order-sensitive run grouping. Exposed as a general
 * operator: assigns a `run_id` per adjacency run of `codeCol` in `orderCols`
 * order via lag + running sum.
 *
 * NOTE: inherently a total-order computation (single-partition window).
 * Harmony files are small dimension inputs, so this never sees big data;
 * for large inputs prefer the intended key-based groupBy instead.
 */
object RunLengthGroup {
  def apply(df: DataFrame, codeCol: String, orderCols: Seq[String],
            runCol: String = "run_id"): DataFrame = {
    val w = Window.orderBy(orderCols.map(col).toIndexedSeq: _*)
    df.withColumn("_chg",
        when(col(codeCol) === lag(col(codeCol), 1).over(w), lit(0)).otherwise(lit(1)))
      .withColumn(runCol,
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_chg")
  }
}
