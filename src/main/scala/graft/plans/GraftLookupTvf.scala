package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, StringType}

/** Relation-valued point reads in pure SQL (VERDICT r12 Next #7, carried
  * from r11 #4):
  *
  * {{{ SELECT * FROM graft_lookup('/data/events',
  *       array(CAST('k1' AS BINARY), CAST('k2' AS BINARY))[, true]) }}}
  *
  * resolves through the SAME index-nested-loop tier as `CALL lookup` and
  * the probe JOIN ([[graft.sources.sstable.SSTableReader.DirectoryProber]]
  * `.get`: bloom filter → Summary search → one bounded Index.db window →
  * one Data.db seek per candidate generation, newest-first) — IO is
  * probes × generations, never table size, and the probe set is
  * SQL-literal-sized, so the rows materialize on the driver with no job,
  * exactly like the CALL. Unlike the CALL (a catalog verb), the TVF is a
  * RELATION — it composes: join it, filter it, UNION it.
  *
  * The first argument is a DIRECTORY path (the path-API tier, same as
  * `spark.read.format("sstable").load(dir)`); catalog tables resolve
  * their live directory through the catalog and are probed by `CALL
  * <catalog>.system.lookup` or the probe JOIN. Third argument (optional,
  * default true) is `gc_tombstones` — the live view; false shows merged
  * tombstone state, both exactly as the CALL defines them.
  *
  * ANALYSIS-TIME materialization (advice r13): the probe runs ONCE, on
  * the driver, when the plan is ANALYZED — the rows land in a
  * [[LocalRelation]] and a reused analyzed plan (a temp view over the
  * TVF, a cached Dataset) keeps serving that frozen snapshot without
  * re-probing. That is the honest semantic of a literal-argument TVF
  * whose result is driver-sized; a reader that wants per-execution
  * freshness should re-issue the SQL (each parse+analyze re-probes) or
  * use the probe JOIN, whose exec snapshots at every execute. A
  * nonexistent directory refuses loudly at analysis (the same contract
  * as the scan path's vanished-between-resolution-and-planning
  * refusal) — a typo'd path must never read as an empty table.
  *
  * Registered as a REAL table function (the `TableFunctionRegistry` /
  * `injectTableFunction` route, via [[graft.GraftExtensions]] at session
  * build or `GraftExtensions.register` on a live session), so Spark's
  * own `ResolveFunctions` resolves it and argument errors surface as
  * analysis errors. NOT a custom resolution rule: extended resolution
  * rules run AFTER `ResolveFunctions` in the batch, which throws its
  * generic unresolvable-TVF error on the FIRST pass whenever the
  * arguments happen to be bare literals — the rule only ever won the
  * race when an inner `array(...)` needed a pass to resolve first
  * (found empirically; the registry route has no such race). */
object GraftLookupTvf {

  val ident: FunctionIdentifier = FunctionIdentifier("graft_lookup")
  val info: ExpressionInfo =
    new ExpressionInfo(GraftLookupTvf.getClass.getName, "graft_lookup")

  /** The TVF builder ResolveFunctions invokes once the arguments are
    * resolved: validates, evaluates the foldable args, probes on the
    * driver, returns the rows as a LocalRelation. */
  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_lookup expects (dir, keys[, gc_tombstones]), got ${args.length} arguments")
    args.zipWithIndex.foreach { case (a, i) =>
      require(a.resolved && a.foldable,
        s"graft_lookup: argument ${i + 1} must be a foldable literal " +
          s"expression, got ${a.sql}")
    }
    val dirArg = args.head
    require(dirArg.dataType == StringType,
      s"graft_lookup: dir must be a string, got ${dirArg.dataType.simpleString}")
    val dir = dirArg.eval() match {
      case null => throw new IllegalArgumentException(
        "graft_lookup: dir must not be NULL")
      case v => v.toString
    }
    val keysArg = args(1)
    require(keysArg.dataType.isInstanceOf[ArrayType] &&
        keysArg.dataType.asInstanceOf[ArrayType].elementType == BinaryType,
      "graft_lookup: keys must be ARRAY<BINARY> (CAST string keys AS " +
        s"BINARY), got ${keysArg.dataType.simpleString}")
    val gc = args.lift(2) match {
      case None => true
      case Some(g) =>
        require(g.dataType == BooleanType,
          s"graft_lookup: gc_tombstones must be boolean, got ${g.dataType.simpleString}")
        // explicit NULL = the default (live view), same as the CALL
        Option(g.eval()).forall(_.asInstanceOf[Boolean])
    }
    val session = SparkSession.active
    val storage = graft.sources.sstable.Storage.forPath(
      dir, session.sessionState.newHadoopConf())
    // existence first (advice r13): a typo'd directory must be an
    // analysis error, never an empty relation (and never the listing
    // layer's confusing "neither a dir nor a -Data.db file")
    if (!storage.exists(dir))
      throw new IllegalArgumentException(
        s"graft_lookup: $dir does not exist — check the path (catalog " +
          "tables resolve their live directory via CALL lookup or the " +
          "probe JOIN, not this TVF)")
    // the raw-path pointer guard every path-API entry shares: probing a
    // tombstoned / mid-swap catalog directory must refuse loudly, never
    // return a residue's partial answer (the r12 contract)
    graft.sources.sstable.spark.SSTableSource.requireLiveRawDir(storage, dir)
    val prober = new graft.sources.sstable.SSTableReader
      .DirectoryProber(dir, storage)
    val schema = graft.sources.sstable.spark.SSTableSchema.schema
    val keys = keysArg.eval() match {
      case null => throw new IllegalArgumentException(
        "graft_lookup: keys must not be NULL")
      case arr: ArrayData => (0 until arr.numElements()).flatMap { i =>
        // NULL keys match nothing — the CALL's contract
        if (arr.isNullAt(i)) None else Some(arr.getBinary(i))
      }
    }
    val rows = keys.flatMap(k => prober.get(k, gcTombstones = gc).map(r =>
      graft.sources.sstable.spark.SSTableSchema.rowToInternal(r, schema)))
    LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      rows)
  }
}
