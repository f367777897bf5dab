package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Append-only JSON MANIFEST LOG over copy-on-write parquet files — the
  * transaction-log half of a lakehouse table format (the piece
  * lake_snapshot_read's path-addressed version dirs deliberately
  * omitted; r13 verdict #7). Mechanics mirror the published formats
  * (Delta/Iceberg) at miniature scale:
  *
  *   - one JSON manifest per version under `_log/`, zero-padded name
  *     (`%020d.json`) so lexicographic listing IS version order;
  *   - each manifest records the version's `adds` and `removes`
  *     (data-file paths relative to the table root) — a LOG of actions,
  *     not a snapshot, so readers REPLAY entries 0..v to resolve the
  *     live file set as of v;
  *   - commits are OPTIMISTIC and atomic, through the ONE
  *     storage-dependent primitive [[LogStore.publish]] (atomic
  *     create-if-absent; POSIX binds it to link(2), an object store
  *     binds it to a conditional PUT / catalog CAS — r14 verdict #5).
  *     Two writers racing to commit the same version → exactly one
  *     wins, the other gets [[Conflict]] and must re-read the log,
  *     rebase, and retry at the next version — the whole
  *     serializable-writer story of a real table format, pinned by
  *     ManifestLogSpec's concurrent-writer test ON BOTH the POSIX and
  *     the CAS-mock store.
  *
  * At 100 TB the log is metadata-sized (one small JSON per commit; the
  * data files never move), reads list one directory, and replay cost
  * stays flat via [[writeCheckpoint]] (checkpoint-seeded tail replay) —
  * maintained automatically by [[CheckpointPolicy]] (r14 verdict #4):
  * every K winning commits fold a checkpoint and prune the manifests
  * already folded by the PREVIOUS checkpoint, so log size and replay
  * cost are both O(K) for the life of the table.
  *
  * PRUNE SAFETY (the mid-prune reader): manifests are deleted in
  * DESCENDING version order, so at every instant the surviving
  * manifests below the prune horizon form a prefix 0..j. A concurrent
  * reader of version w therefore either (a) replays an intact prefix /
  * an intact checkpoint + tail — exact; or (b) finds w missing from the
  * listing and fails the [[filesAsOf]] membership require — loud. A
  * SILENT wrong resolution (replay over a gapped prefix, which
  * ascending-order deletion would permit) cannot occur; pinned by
  * ManifestLogSpec's torn-prune test. */
object ManifestLog {

  /** Optimistic-concurrency loser: `version` was committed by another
    * writer between this writer's read and its publish. */
  final case class Conflict(version: Long) extends RuntimeException(
    s"manifest version $version already committed by a concurrent writer")

  /** A SEMANTIC loser (r16): a concurrent winner's actions overlap
    * this transaction's read or write set, so re-publishing the same
    * actions at a later version would serialize to a wrong history —
    * retrying cannot help; the transaction must re-derive its outputs
    * from a fresh snapshot. (The physical [[Conflict]] is retriable;
    * this one is not — the distinction every optimistic table format
    * draws.) */
  final case class LogicalConflict(version: Long, detail: String)
    extends RuntimeException(
      s"serializable conflict with winning commit $version: $detail")

  /** Auto-checkpoint policy (r14 verdict #4): after a winning commit of
    * a version divisible by `every` (and > 0), fold a checkpoint at
    * that version and prune the manifests at or below the PREVIOUS
    * checkpoint (they are folded twice over; the tail since the
    * previous checkpoint stays replayable for time travel).
    * Checkpoints themselves are never auto-deleted — one tiny file per
    * K commits, and each keeps its own version resolvable forever. */
  final case class CheckpointPolicy(every: Long) {
    require(every > 0, s"checkpoint interval must be positive: $every")
  }

  /** Per-file column statistics carried in the manifest (r15): the
    * DATA-SKIPPING seam of a real table format (Iceberg manifest
    * min/max, Delta's stats JSON) at miniature scale — one tracked
    * column, closed [min, max] per file. A reader with a range
    * predicate prunes files whose interval cannot intersect it WITHOUT
    * touching data — the decision is metadata-sized at any table size.
    * Files committed without stats are never skipped (conservative:
    * unknown means must-read), so stats are a pure optimization and
    * can be adopted file-by-file.
    *
    * `dbl` (r17) marks bounds that are IEEE sortable-bits IMAGES of a
    * DOUBLE column ([[ManifestFileIndex.dblKey]]) rather than raw
    * longs. Pruning never needs the tag (Catalyst's type coercion
    * guarantees a pushed-down literal matches the column's type, so
    * image bounds only ever meet image predicates) — but the
    * COMMIT-TIME CHECK PROOF does: a session-free-parsed constraint
    * carries untyped literals, and proving an integral bound against
    * image stats (or vice versa) would be arithmetic over two
    * different orderings — the tag makes the proof refuse the
    * mismatch instead of silently passing violating rows. Serialized
    * as a trailing `|d` on the flat colstats entry; absent = raw. */
  final case class FileStat(min: Long, max: Long, dbl: Boolean = false)

  /** Per-file STRING column bounds (r17; closes the r16 verdict's
    * task 5): closed [min, max] in UTF-8 BYTE order — the exact
    * ordering Catalyst's UTF8String binary comparison uses, so a
    * pushed-down string predicate prunes by the same collation the
    * row filter decides by (Java's UTF-16 String order DISAGREES
    * with it for supplementary characters; using it would drop
    * needed files). Bounds are stored FULL, base64-wrapped in the
    * flat manifest (no truncation — no collation edge cases, at the
    * cost of manifest bytes proportional to two values per file per
    * column; a format that truncates must mark the bound inexact and
    * treat it as must-read, which is the conservatism we get for
    * free by not truncating). Files without an entry are never
    * skipped. */
  final case class StrStat(min: String, max: String)

  /** A per-file DELETION VECTOR sidecar reference (r16) — the
    * merge-on-read half of the row-change story (Delta's deletion
    * vectors, Iceberg's position deletes): instead of rewriting a
    * whole data file to drop a few rows (copy-on-write, `lake_merge_cow`),
    * a delete commits a SIDECAR of the file's dead row indexes and the
    * data file stays byte-identical on disk. The manifest carries only
    * (sidecar path, dead-row count) — constant metadata per file — and
    * the read path filters `(file, _metadata.row_index)` pairs against
    * the vectors. A later DV for the same file REPLACES the earlier one
    * (each new vector is written as the union of the old and the newly
    * dead rows, so "latest wins" is exact); a file's remove drops its
    * DV. At 100 TB this is why deleting 0.01% of rows costs KBs of
    * sidecar instead of re-writing TBs of parquet; the DV's size is the
    * read path's tax, so compaction rewrites a file once its vector
    * outgrows a threshold ([[compactDvs]]). */
  final case class DvRef(sidecar: String, nDeleted: Long)

  /** A per-file bloom-filter SIDECAR reference carried in the manifest
    * (r15): the manifest records only (column, sidecar path, m, k) —
    * constant metadata per file at any data size — while the bit
    * array itself lives in a sidecar file beside the data (Iceberg's
    * puffin layout; an in-manifest bloom would grow the LOG with the
    * DATA, which is the one thing a manifest must never do). Sidecars
    * are immutable and written before the commit that references
    * them, like data files.
    *
    * `str` (r18 advice) tags the KEY TYPE the writer folded: false =
    * canonical-long keys (integral/timestamp/date), true =
    * [[FileBloom.strKey]] FNV-1a over UTF-8 bytes. The read-side
    * prune paths probe only matching-typed blooms — probing a
    * long-keyed bloom with string keys (or vice versa) hashes a
    * different value and produces FALSE NEGATIVES, i.e. silently
    * wrong file pruning; a type mismatch now degrades to must-read
    * instead. Serialized as a trailing `|s` on the flat entry
    * (absent = long), like the colstats `|d` marker.
    *
    * `legacy` (r19 review finding): an UNTAGGED ref parsed from a
    * manifest written before the format carried its `fmt` version
    * field — its key type is unknowable from metadata (pre-r18 string
    * blooms parse str = false), so the LONG-probe paths treat it as
    * must-read unless the same file carries long colStats for the
    * column (the writer folds bloom keys and stats from the same
    * canonical image, so long stats prove a long-keyed fold).
    * Re-serialization (checkpoints, clones) preserves the mark as a
    * trailing `|l` so folding a legacy log into an fmt-2 checkpoint
    * never launders the uncertainty away. */
  final case class BloomRef(column: String, sidecar: String, m: Int,
      k: Int, str: Boolean = false, legacy: Boolean = false)

  /** The full fold of the log up to a version: live files, their
    * single-column stats, their NAMED-column stats (path → column →
    * [min, max]; the multi-dimensional skipping seam), their bloom
    * sidecar refs (path → column → ref; the point-lookup seam), and
    * the latest committed batch per writer appId (the exactly-once
    * txn seam — Delta's setTransaction / txn action). */
  final case class Replay(files: Seq[String],
      stats: Map[String, FileStat],
      colStats: Map[String, Map[String, FileStat]],
      blooms: Map[String, Map[String, BloomRef]],
      txns: Map[String, Long],
      dvs: Map[String, DvRef] = Map.empty,
      schemaDdl: Option[String] = None,
      checks: Map[String, String] = Map.empty,
      strColStats: Map[String, Map[String, StrStat]] = Map.empty,
      nullStats: Map[String, Map[String, NullStat]] = Map.empty,
      // "has the table EVER committed a deletion vector through the
      // replayed version" — folded DURING the replay from the same
      // reads (r20; r19 verdict what's-wrong #3: writeCheckpointIn
      // re-parsed the tail manifests dvsEverThrough had already
      // covered). Some(bit) when the replay's own reads decide it
      // exactly (the seeding checkpoint carried the bit, or the fold
      // started from genesis); None when a legacy checkpoint without
      // the bit hides pruned history — callers fall back to
      // [[dvsEverThrough]]'s full surviving-metadata scan.
      dvsEver: Option[Boolean] = None)

  /** Per-file per-column NULL COUNT + the file's row count (r18; the
    * r17 verdict's task 5): the one pair that lets `IS NULL` /
    * `IS NOT NULL` predicates prune files — [min, max] bounds are
    * folded over NON-null rows only and cannot see nulls, so before
    * this every null predicate was must-read everywhere. A file
    * prunes under `IS NULL` when nulls = 0 and under `IS NOT NULL`
    * when nulls = rows; files without an entry are never skipped
    * (unknown = must-read, the standing conservative contract).
    * Delta's stats JSON carries the same nullCount for the same
    * reason. */
  final case class NullStat(nulls: Long, rows: Long)

  private def logDir(root: String): Path = Paths.get(root, "_log")
  private def manifestName(v: Long): String = f"$v%020d.json"
  private def checkpointName(v: Long): String = f"$v%020d.checkpoint.json"
  // the checkpoint's tiny metadata sibling (r18): just (version,
  // schema, checks), so the per-commit CHECK gate reads KBs instead
  // of the full checkpoint — at 1M files the checkpoint is ~76 MiB
  // and reading it per gated commit grew commit cost 8 ms → 297 ms
  // (the log-scale probe's one cliff). Published idempotently beside
  // the checkpoint; pre-r18 checkpoints without one fall back to the
  // full read.
  private def checkpointMetaName(v: Long): String =
    f"$v%020d.checkpoint.meta.json"
  // the columnar per-file-state sidecar (r19; see [[CheckpointCodec]])
  // of a `pq`-marked checkpoint
  private def checkpointParquetName(v: Long): String =
    f"$v%020d.checkpoint.parquet"

  private val ManifestRe = "^\\d{20}\\.json$".r
  private val CheckpointRe = "^\\d{20}\\.checkpoint\\.json$".r

  /** True iff the flat manifest format can round-trip `s`: no field
    * ('|'), element (','), quote ('"') or field-terminator (']')
    * delimiter — enforced on every committed string (r15 advice). */
  private[sources] def flatSafe(s: String): Boolean =
    !s.exists(c => c == '|' || c == ',' || c == '"' || c == ']')

  /** The production binding: this table root's `_log/` directory on a
    * POSIX filesystem. */
  def storeFor(root: String): LogStore = new PosixLogStore(logDir(root))

  /** Resolve a committed path to its on-disk location: an entry
    * beginning with '/' is an ABSOLUTE reference to bytes OUTSIDE
    * this table's root — the shallow-clone seam (Delta stores
    * fully-qualified paths in a clone's log the same way) — and
    * everything else is root-relative. Every read-side path
    * construction goes through here so absolute references flow
    * through scans, DV anti-joins, bloom reads and the CDC feed
    * without special cases; WRITE-side paths (new data files, new
    * sidecars) are always root-relative — a table only ever writes
    * inside its own root. */
  private[sources] def resolvePath(root: String,
      rel: String): java.io.File =
    if (rel.startsWith("/")) new java.io.File(rel)
    else new java.io.File(root, rel)

  // ---- store-parameterized core (the storage-agnostic protocol) ----

  /** Stage + atomically publish the manifest for `version`; throws
    * [[Conflict]] (leaving the log untouched) if that version is
    * already committed. With a `policy`, the winning commit then
    * maintains the checkpoint + retention invariants.
    *
    * COMMIT-TIME CHECK ENFORCEMENT (r17): on a table whose log
    * carries CHECK constraints, a commit that ADDS files must PROVE
    * each constraint from the adds' own [min, max] column stats
    * (`min >= lo && max <= hi` for every range constraint — NULL
    * rows pass SQL CHECK and never enter stats, so the proof is
    * exact) or be refused loudly. Adds whose stats cannot carry the
    * proof — stats-less files, non-range constraints — need
    * `attest = true`, the caller's statement that it row-validated
    * the batch ([[appendChecked]] does; [[requireSatisfies]] is the
    * hand-rolled form). A commit that itself DECLARES `checks` is
    * the ALTER-style declaration: the declarer validates existing
    * data and its own adds by contract, exactly as Delta's ADD
    * CONSTRAINT does. This closes the hole where a raw [[commitIn]]
    * could land violating rows under a constraint the guarded paths
    * enforce. */
  def commitIn(store: LogStore, version: Long, adds: Seq[String],
      removes: Seq[String], op: String,
      policy: Option[CheckpointPolicy] = None,
      stats: Map[String, FileStat] = Map.empty,
      colStats: Map[String, Map[String, FileStat]] = Map.empty,
      blooms: Map[String, Map[String, BloomRef]] = Map.empty,
      txn: Option[(String, Long)] = None,
      dvs: Map[String, DvRef] = Map.empty,
      commitMs: Option[Long] = None,
      schemaDdl: Option[String] = None,
      checks: Option[Seq[(String, String)]] = None,
      attest: Boolean = false,
      strColStats: Map[String, Map[String, StrStat]] = Map.empty,
      nullStats: Map[String, Map[String, NullStat]] = Map.empty): Unit = {
    if (adds.nonEmpty && !attest && checks.isEmpty && version > 0) {
      // the gate needs only the in-force CHECKS and the declared
      // schema — resolved by the METADATA-ONLY fold (r18): a full
      // replayIn builds the live-file maps too, which at 1M files is
      // a multi-second parse paid by EVERY add-commit (the log-scale
      // probe's one cliff); this fold skips the file fields entirely
      val (prevDdl, inForce) = metaAsOfIn(store, version - 1)
      // mixed-type constraints resolve their columns' types from the
      // committed schemaDdl (r18; the session-free parser alone
      // cannot — closes §8.3.4-12's attest fallback for
      // `integral-col AND fractional-col` constraints)
      val declared = prevDdl.map(
        org.apache.spark.sql.types.StructType.fromDDL)
      inForce.toSeq.sortBy(_._1).foreach { case (n, sqlText) =>
        // three strict decompositions of the constraint, each provable
        // against ONE stat type: raw-long bounds against untagged
        // stats, double-image bounds against dbl-tagged stats (r17 —
        // a session-free-parsed literal is untyped, so the STAT's tag
        // decides which arithmetic is sound; comparing across the two
        // orderings could pass violating rows), string atoms against
        // string bounds. A constraint proves when ANY decomposition
        // proves with matching-typed stats on every referenced column
        // — or (r18) when the TYPE-RESOLVED mixed decomposition
        // proves every per-column obligation under its own stat type.
        val lb = provableBounds(sqlText)
        val db = provableDblBounds(sqlText)
        val sa = provableStrAtoms(sqlText)
        val tb = declared.flatMap(provableTypedBounds(sqlText, _))
        // NOT-NULL constraints prove from the r18 null counts — the
        // most common non-range shape leaves the attest fallback
        val nn = provableNotNullAtoms(sqlText)
        if (lb.isEmpty && db.isEmpty && sa.isEmpty && tb.isEmpty &&
            nn.isEmpty)
          throw new IllegalArgumentException(
            s"requirement failed: table carries CHECK $n [$sqlText]" +
              ", which file stats cannot prove — commit adds " +
              "through appendChecked (row-validated) or pass " +
              "attest = true after validating")
        adds.foreach { f =>
          val cs = colStats.getOrElse(f, Map.empty)
          val ss = strColStats.getOrElse(f, Map.empty)
          val provenLong = lb.exists(_.forall { case (c, (lo, hi)) =>
            cs.get(c).exists(s => !s.dbl && s.min >= lo && s.max <= hi)
          })
          val provenDbl = db.exists(_.forall { case (c, (lo, hi)) =>
            cs.get(c).exists(s => s.dbl && s.min >= lo && s.max <= hi)
          })
          val provenStr = sa.exists(_.forall { case (c, op, v) =>
            ss.get(c).exists(strAtomProven(_, op, v))
          })
          val ns = nullStats.getOrElse(f, Map.empty)
          def notNullProven(c: String): Boolean =
            ns.get(c).exists(_.nulls == 0L)
          val provenNotNull = nn.exists(_.forall(notNullProven))
          val provenTyped = tb.exists { case (longB, dblB, strA, nnc) =>
            longB.forall { case (c, (lo, hi)) =>
              cs.get(c).exists(s =>
                !s.dbl && s.min >= lo && s.max <= hi) } &&
            dblB.forall { case (c, (lo, hi)) =>
              cs.get(c).exists(s =>
                s.dbl && s.min >= lo && s.max <= hi) } &&
            strA.forall { case (c, op, v) =>
              ss.get(c).exists(strAtomProven(_, op, v)) } &&
            nnc.forall(notNullProven)
          }
          require(provenLong || provenDbl || provenStr ||
              provenNotNull || provenTyped,
            s"add $f cannot prove CHECK $n [$sqlText]: committed " +
              "stats must sit inside the constraint's bounds IN THE " +
              "COLUMN'S TYPE (integral bounds prove against raw-long " +
              "stats, fractional against double-image stats, string " +
              "atoms against string bounds, IS NOT NULL against a " +
              "zero null count; got " +
              s"${cs.keySet ++ ss.keySet ++ ns.keySet}) — validate " +
              "rows and attest, or commit stats that prove it")
        }
      }
    }
    def arr(fs: Seq[String]) =
      fs.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    // EVERY string the self-authored flat format carries must be
    // round-trippable by its parser: fields are '|'-delimited,
    // elements ','-delimited, strings '"'-quoted, and the field regex
    // stops at the first ']' — a path/column/appId containing any of
    // those four chars would serialize fine and then silently
    // mis-split on replay, corrupting the live set. Rejecting them at
    // commit time keeps the corruption loud at the write (r15 advice).
    // Spark part-file names never contain them; this guards the
    // PUBLIC commit API against arbitrary caller strings.
    require((adds ++ removes).forall(flatSafe),
      "committed paths must not contain '|', ',', '\"' or ']' — " +
        "the flat manifest format cannot round-trip them")
    // membership checks below run against SETS (r20): a 100k-add bulk
    // commit with per-file colStats used to pay adds.contains — an
    // O(adds) Seq scan — PER map entry, i.e. 10^10 comparisons; the
    // probe that found it spent minutes per commit on pure validation
    val addSet = adds.toSet
    val removeSet = removes.toSet
    // stats ride as flat "path|min|max" strings so the self-authored
    // parser stays one shape
    require(stats.keySet.forall(addSet),
      "stats must describe committed adds")
    // the unnamed channel's flat "path|min|max" entries carry no type
    // tag — a dbl-tagged stat committed through it would round-trip
    // UNTAGGED, a latent hole in the typed-proof invariant (r17
    // advice). Double-image stats must ride as NAMED colStats.
    require(stats.valuesIterator.forall(!_.dbl),
      "double-image stats cannot ride the unnamed 'stats' channel " +
        "(its flat entries drop the '|d' type tag the CHECK proof " +
        "decides by) — commit them as named colStats")
    // colstats ride as "path|col|min|max"; blooms as
    // "path|col|sidecar|m|k"; txn as "appId|batchId"
    require(colStats.forall { case (f, cs) =>
      addSet(f) && cs.keySet.forall(flatSafe) },
      "colstats must describe committed adds with round-trippable columns")
    // a PURE-METADATA commit (no adds, no removes) may target blooms
    // at files that are ALREADY LIVE (r20: the retagBlooms
    // maintenance op re-declares a live file's ref set with corrected
    // key-type tags — same precedent as dvs). Every data-carrying
    // commit keeps the strict adds-only rule, so a writer whose
    // bloom map drifts from its adds (a renamed path, a typo) still
    // fails LOUDLY here instead of committing an inert ref (r20
    // second review pass). LIVENESS of the metadata-commit targets is
    // the caller's contract (checking it would cost the full replay
    // the r18 gate work removed): a ref for a dead path is INERT —
    // never consulted by a scan, dropped by the next checkpoint's
    // files-major fold — so the failure mode is lost metadata, never
    // wrong results. retagBlooms derives its targets from the
    // replay's own live set.
    val metadataOnly = adds.isEmpty && removes.isEmpty
    require(blooms.forall { case (f, bs) =>
      (addSet(f) || (metadataOnly && flatSafe(f))) &&
        bs.forall { case (c, r) =>
          flatSafe(c) && flatSafe(r.sidecar) && r.m > 0 &&
            (r.m & (r.m - 1)) == 0 && r.k > 0 } },
      "blooms must describe committed adds (or, on a pure-metadata " +
        "commit, live files); round-trippable fields; m a power of two")
    require(txn.forall { case (app, b) => flatSafe(app) && b >= 0 },
      "txn appId must be round-trippable with a non-negative batchId")
    // dvs target files that are ALREADY LIVE (a merge-on-read delete
    // touches no data files), so membership in `adds` is NOT required;
    // a dv for a file this same commit removes would be dead on arrival
    require(dvs.forall { case (f, d) =>
      flatSafe(f) && flatSafe(d.sidecar) && d.nDeleted > 0 &&
        !removeSet(f) },
      "dvs need round-trippable paths, a positive dead-row count, and " +
        "must not target a file this commit removes")
    val statArr = arr(adds.flatMap(f =>
      stats.get(f).map(st => s"$f|${st.min}|${st.max}")))
    val colStatArr = arr(adds.flatMap(f =>
      colStats.get(f).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
        case (c, st) => s"$f|$c|${st.min}|${st.max}" +
          (if (st.dbl) "|d" else "") })))
    // adds first (byte-identical to the pre-r20 layout for every
    // caller whose bloom keys are adds), then live-file retag targets
    val bloomFiles = adds ++
      blooms.keys.filterNot(addSet).toSeq.sorted
    val bloomArr = arr(bloomFiles.flatMap(f =>
      blooms.get(f).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
        case (c, r) => s"$f|$c|${r.sidecar}|${r.m}|${r.k}" +
          (if (r.str) "|s" else "") +
          (if (r.legacy && !r.str) "|l" else "") })))
    val txnArr = arr(txn.toSeq.map { case (app, b) => s"$app|$b" })
    val dvArr = arr(dvs.toSeq.sortBy(_._1).map {
      case (f, d) => s"$f|${d.sidecar}|${d.nDeleted}" })
    require(commitMs.forall(_ >= 0), "commit timestamp must be >= 0")
    val atArr = arr(commitMs.toSeq.map(_.toString))
    // schema DDL carries every delimiter the flat format cannot
    // round-trip (commas, quotes, brackets) — base64 the whole string
    val schemaArr = arr(schemaDdl.toSeq.map(d =>
      java.util.Base64.getEncoder.encodeToString(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    // CHECK constraints: "name|b64(sqlExpr)" entries; a declaring
    // commit replaces the WHOLE set (latest declaration wins, like
    // schema), and the empty declaration serializes as the "-"
    // sentinel so "drop all constraints" survives the flat parser's
    // absent-vs-empty ambiguity
    require(checks.forall(_.forall { case (n, e) =>
      flatSafe(n) && n.nonEmpty && n != "-" && e.nonEmpty }),
      "check names must be round-trippable, non-empty, and not '-'")
    val checkArr = arr(checks match {
      case Some(cs) if cs.isEmpty => Seq("-")
      case Some(cs) => cs.sortBy(_._1).map { case (n, e) =>
        s"$n|${java.util.Base64.getEncoder.encodeToString(
          e.getBytes(java.nio.charset.StandardCharsets.UTF_8))}" }
      case None => Seq.empty
    })
    // string bounds ride as "path|col|b64(min)|b64(max)" — base64
    // because the bounds are ARBITRARY user strings (every delimiter
    // the flat format cannot round-trip is fair game in data)
    require(strColStats.forall { case (f, cs) =>
      addSet(f) && cs.keySet.forall(flatSafe) },
      "strstats must describe committed adds with round-trippable " +
        "columns")
    def b64s(s: String) = java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val strStatArr = arr(adds.flatMap(f =>
      strColStats.get(f).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
        case (c, st) => s"$f|$c|${b64s(st.min)}|${b64s(st.max)}" })))
    // null stats ride as "path|col|nulls|rows" (r18); nulls ∈ [0, rows]
    require(nullStats.forall { case (f, ns) =>
      addSet(f) && ns.forall { case (c, s) =>
        flatSafe(c) && s.nulls >= 0 && s.rows >= s.nulls } },
      "nullstats must describe committed adds with round-trippable " +
        "columns and 0 <= nulls <= rows")
    val nullStatArr = arr(adds.flatMap(f =>
      nullStats.get(f).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
        case (c, s) => s"$f|$c|${s.nulls}|${s.rows}" })))
    val json = s"""{"version":$version,"op":"$op","fmt":["2"],""" +
      s""""adds":${arr(adds)},"removes":${arr(removes)},""" +
      s""""stats":$statArr,"colstats":$colStatArr,""" +
      s""""blooms":$bloomArr,"txn":$txnArr,"dvs":$dvArr,""" +
      s""""at":$atArr,"schema":$schemaArr,"checks":$checkArr,""" +
      s""""strstats":$strStatArr,"nullstats":$nullStatArr}"""
    if (!store.publish(manifestName(version), json)) throw Conflict(version)
    for (p <- policy if version > 0 && version % p.every == 0) {
      writeCheckpointIn(store, version)
      // retention: manifests folded by the PREVIOUS checkpoint are now
      // folded twice over — prune them, newest first (see prune-safety
      // note in the object doc)
      for (prev <- checkpointVersionsIn(store).filter(_ < version)
             .lastOption;
           v <- versionsIn(store).filter(_ <= prev).reverse)
        store.delete(manifestName(v))
    }
  }

  /** Committed versions in ascending order (stage temp files are
    * dot-prefixed and already absent from [[LogStore.list]];
    * checkpoints carry a `.checkpoint` infix and are skipped here). */
  def versionsIn(store: LogStore): Seq[Long] =
    store.list().filter(n => ManifestRe.matches(n))
      .map(_.stripSuffix(".json").toLong).sorted

  /** Versions with a published checkpoint, ascending. */
  def checkpointVersionsIn(store: LogStore): Seq[Long] =
    store.list().filter(n => CheckpointRe.matches(n))
      .map(_.stripSuffix(".checkpoint.json").toLong).sorted

  // self-authored JSON (writers above/below): fields are flat string
  // arrays, so this scan is a parser for exactly this format
  private def field(json: String, name: String): Seq[String] = {
    val m = ("\"" + name + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
    m.map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).toSeq)
      .getOrElse(Seq.empty)
  }

  /** CHECKPOINT COMPACTION — fold the log's replay up to `version` into
    * one snapshot file, so readers replay only the manifest TAIL after
    * the nearest checkpoint instead of the whole history (the
    * replay-cost rung a real format's checkpoints exist for; without
    * one, resolve cost grows with table age forever). A checkpoint is
    * DERIVED state: every writer computes the identical content from
    * the immutable manifests, so publication is idempotent — the same
    * atomic-publish protocol as [[commitIn]] but a lost race is a
    * no-op, not a conflict. */
  /** `parquet = true` (the default since r19) publishes the per-file
    * state as a columnar sidecar + a KB JSON checkpoint carrying only
    * the scalar fields and a `pq` marker (see [[CheckpointCodec]]);
    * `false` keeps the legacy all-JSON layout — the seam the
    * equality pin in LogStoreCrashSpec and legacy-log tests use.
    * Publish order is sidecar FIRST, JSON second: the JSON publish is
    * the atomic commit point, an orphaned sidecar from a crash
    * in between is invisible (and byte-identical on the retry, the
    * content being a pure function of the immutable manifests). */
  def writeCheckpointIn(store: LogStore, version: Long,
      parquet: Boolean = true): Unit = {
    val r = replayIn(store, version)
    def q(s: String) = "\"" + s + "\""
    // fold the version's own commit timestamp (when recorded) so the
    // checkpoint keeps its era TIME-addressable after retention prunes
    // the manifest (SURVEY §8.3.2-4); a re-publication after pruning
    // recovers it from the existing checkpoint
    val at: Seq[String] =
      if (versionsIn(store).contains(version))
        field(store.read(manifestName(version)), "at")
      else if (checkpointVersionsIn(store).contains(version))
        field(store.read(checkpointName(version)), "at")
      else Seq.empty
    // the DVS-EVER bit (r19; r18 verdict next-8 #7): "has this table
    // EVER committed a deletion vector through `version`" folds
    // forward through checkpoints, so the image feed's unresolvable-
    // baseline probe reads one KB sibling + the tail instead of
    // scanning every surviving manifest's dvs field (O(versions)
    // driver reads per feed open at log scale). Strictly MORE
    // conservative than the surviving-metadata scan it accelerates: a
    // historical vector whose refs were later compacted away still
    // sets the bit (its baseline genuinely is unclassifiable).
    // Computed DURING the replay above from the same manifest reads
    // (r20; r19 verdict what's-wrong #3 retired the duplicate O(tail)
    // pass); only a legacy seeding checkpoint without the bit pays
    // dvsEverThrough's full surviving-metadata scan.
    val dvsEver =
      if (r.dvsEver.getOrElse(dvsEverThrough(store, version))) "1"
      else "0"
    if (parquet) {
      // the replay's per-file maps are live-only by construction
      // (removes drop their entries in the fold), same invariant the
      // legacy JSON writer leans on via its files-major iteration
      val sidecar = CheckpointCodec.encode(CheckpointCodec.PerFileState(
        r.files, r.stats, r.colStats, r.strColStats, r.nullStats,
        r.blooms, r.dvs))
      store.publishBytes(checkpointParquetName(version), sidecar)
      val json = s"""{"version":$version,"pq":["1"],"fmt":["2"],""" +
        s""""txns":[${txnsJson(r)}],"schema":[${schemaJson(r)}],""" +
        s""""checks":[${checksJson(r)}],"at":[""" +
        at.map(q).mkString(",") +
        """],"dvsever":[""" + q(dvsEver) + "]}"
      store.publish(checkpointName(version), json)
      publishCheckpointMeta(store, version, r, at, dvsEver)
      return
    }
    val json = s"""{"version":$version,"fmt":["2"],"files":[""" +
      r.files.map(q).mkString(",") + """],"stats":[""" +
      r.files.flatMap(f => r.stats.get(f).map(st =>
        q(s"$f|${st.min}|${st.max}"))).mkString(",") +
      """],"colstats":[""" +
      r.files.flatMap(f => r.colStats.get(f).toSeq
        .flatMap(_.toSeq.sortBy(_._1).map { case (c, st) =>
          q(s"$f|$c|${st.min}|${st.max}" +
            (if (st.dbl) "|d" else "")) })).mkString(",") +
      """],"blooms":[""" +
      r.files.flatMap(f => r.blooms.get(f).toSeq
        .flatMap(_.toSeq.sortBy(_._1).map { case (c, b) =>
          q(s"$f|$c|${b.sidecar}|${b.m}|${b.k}" +
            (if (b.str) "|s" else "") +
            (if (b.legacy && !b.str) "|l" else "")) })).mkString(",") +
      """],"txns":[""" + txnsJson(r) + """],"dvs":[""" +
      r.files.flatMap(f => r.dvs.get(f).map(d =>
        q(s"$f|${d.sidecar}|${d.nDeleted}"))).mkString(",") +
      """],"schema":[""" + schemaJson(r) +
      """],"checks":[""" + checksJson(r) +
      """],"at":[""" + at.map(q).mkString(",") + """],"strstats":[""" +
      r.files.flatMap(f => r.strColStats.get(f).toSeq
        .flatMap(_.toSeq.sortBy(_._1).map { case (c, st) =>
          def b64(s: String) = java.util.Base64.getEncoder
            .encodeToString(s.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
          q(s"$f|$c|${b64(st.min)}|${b64(st.max)}") })).mkString(",") +
      """],"nullstats":[""" +
      r.files.flatMap(f => r.nullStats.get(f).toSeq
        .flatMap(_.toSeq.sortBy(_._1).map { case (c, s) =>
          q(s"$f|$c|${s.nulls}|${s.rows}") })).mkString(",") +
      """],"dvsever":[""" + q(dvsEver) + "]}"
    store.publish(checkpointName(version), json) // false = lost race, ok
    // the metadata sibling: derived state like the checkpoint itself,
    // so a lost publish race is a no-op; a crash between the two
    // publishes leaves a checkpoint without a sibling, which the
    // metadata fold handles by falling back to the full read
    publishCheckpointMeta(store, version, r, at, dvsEver)
  }

  private def publishCheckpointMeta(store: LogStore, version: Long,
      r: Replay, at: Seq[String], dvsEver: String): Unit = {
    def q(s: String) = "\"" + s + "\""
    val metaJson = s"""{"version":$version,"schema":[${schemaJson(r)}],""" +
      s""""checks":[${checksJson(r)}],""" +
      """"dvsever":[""" + q(dvsEver) + "]}"
    store.publish(checkpointMetaName(version), metaJson)
  }

  // the scalar checkpoint fields, serialized ONCE (review finding,
  // r19: three hand-rolled copies of these fragments — checkpoint,
  // pq checkpoint, meta sibling — had to be kept byte-identical by
  // hand, a silent format fork waiting to happen)
  private def ckptQ(s: String) = "\"" + s + "\""
  private def txnsJson(r: Replay): String =
    r.txns.toSeq.sortBy(_._1).map { case (app, b) =>
      ckptQ(s"$app|$b") }.mkString(",")
  private def schemaJson(r: Replay): String =
    r.schemaDdl.map(d => ckptQ(java.util.Base64.getEncoder
      .encodeToString(d.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)))).getOrElse("")
  private def checksJson(r: Replay): String =
    if (r.checks.isEmpty) ckptQ("-")
    else r.checks.toSeq.sortBy(_._1).map { case (n, e) =>
      ckptQ(s"$n|" + java.util.Base64.getEncoder.encodeToString(
        e.getBytes(java.nio.charset.StandardCharsets.UTF_8))) }
      .mkString(",")

  /** Has the table EVER committed a deletion vector through
    * `version`? When the nearest checkpoint ≤ `version` carries the
    * bit, the answer is that bit OR'd with the tail manifests' dvs
    * fields — O(tail). When it does NOT (a legacy, pre-r19
    * checkpoint), the fallback reproduces the FULL surviving-metadata
    * scan — every checkpoint ≤ `version` and every surviving manifest
    * ≤ `version`, not just the last checkpoint + tail: earlier
    * checkpoints are never auto-deleted and can be the only survivors
    * still carrying a dv ref after a compaction + prune, so a
    * last-checkpoint-only fallback would bake a FALSE "0" into the
    * next checkpoint and the image feed's fast path would then
    * silently serve an empty DV baseline where the old scan refused
    * loudly (review finding, r19). The bit written on top of a legacy
    * log is therefore never weaker than the scan it replaces. */
  def dvsEverThrough(store: LogStore,
      version: Long): Boolean = {
    val ckpts = checkpointVersionsIn(store).filter(_ <= version)
    // prefer the KB meta sibling for the bit (r20): a legacy all-JSON
    // checkpoint can be tens of MiB; the sibling carries the same bit
    // since r19, and an r18-era sibling without it falls through to
    // the full checkpoint read unchanged
    lazy val lastJson = ckpts.lastOption.map(cv =>
      store.read(checkpointName(cv)))
    val bit = ckpts.lastOption.flatMap { cv =>
      val fromMeta =
        if (store.list().contains(checkpointMetaName(cv)))
          field(store.read(checkpointMetaName(cv)), "dvsever").headOption
        else None
      fromMeta.orElse(
        lastJson.flatMap(j => field(j, "dvsever").headOption))
    }
    bit match {
      case Some(bit) =>
        bit == "1" || versionsIn(store)
          .filter(v => v <= version && v > ckpts.last)
          .exists(v => field(store.read(manifestName(v)), "dvs").nonEmpty)
      case None =>
        // fallback: every checkpoint's bit-or-refs (each read ONCE;
        // earlier fmt-2 checkpoints' bits count too — review
        // finding, r19) plus every surviving manifest's refs
        lastJson.exists(j => field(j, "dvs").nonEmpty) ||
        ckpts.dropRight(1).exists { cv =>
          val j = store.read(checkpointName(cv))
          field(j, "dvsever").headOption.contains("1") ||
            field(j, "dvs").nonEmpty
        } ||
        versionsIn(store).filter(_ <= version).exists(v =>
          field(store.read(manifestName(v)), "dvs").nonEmpty)
    }
  }

  private def parseStats(entries: Seq[String]): Map[String, FileStat] =
    entries.map { e =>
      val i = e.lastIndexOf('|'); val j = e.lastIndexOf('|', i - 1)
      e.substring(0, j) ->
        FileStat(e.substring(j + 1, i).toLong, e.substring(i + 1).toLong)
    }.toMap

  /** "path|col|min|max[|d]" → path → col → stat (path may contain
    * no '|', enforced at commit, so rightmost-split parsing is
    * unambiguous; the optional trailing "|d" marks double-image
    * bounds and can never be confused with max, which is numeric). */
  private def parseColStats(
      entries: Seq[String]): Map[String, Map[String, FileStat]] =
    entries.map { raw =>
      val dbl = raw.endsWith("|d")
      val e = if (dbl) raw.dropRight(2) else raw
      val i = e.lastIndexOf('|'); val j = e.lastIndexOf('|', i - 1)
      val k = e.lastIndexOf('|', j - 1)
      (e.substring(0, k), e.substring(k + 1, j),
        FileStat(e.substring(j + 1, i).toLong,
          e.substring(i + 1).toLong, dbl))
    }.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap

  /** "path|sidecar|n" → path → dv ref (rightmost-split, '|'-free
    * fields enforced at commit). */
  private def parseStrColStats(
      entries: Seq[String]): Map[String, Map[String, StrStat]] =
    entries.map { e =>
      val parts = e.split('|')
      def un(b64: String) = new String(
        java.util.Base64.getDecoder.decode(b64),
        java.nio.charset.StandardCharsets.UTF_8)
      (parts(0), parts(1), StrStat(un(parts(2)), un(parts(3))))
    }.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap

  /** "path|col|nulls|rows" → path → col → null stat (rightmost-split,
    * '|'-free fields enforced at commit). */
  private def parseNullStats(
      entries: Seq[String]): Map[String, Map[String, NullStat]] =
    entries.map { e =>
      val i = e.lastIndexOf('|'); val j = e.lastIndexOf('|', i - 1)
      val k = e.lastIndexOf('|', j - 1)
      (e.substring(0, k), e.substring(k + 1, j),
        NullStat(e.substring(j + 1, i).toLong,
          e.substring(i + 1).toLong))
    }.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap

  private def parseDvs(entries: Seq[String]): Map[String, DvRef] =
    entries.map { e =>
      val i = e.lastIndexOf('|'); val j = e.lastIndexOf('|', i - 1)
      e.substring(0, j) ->
        DvRef(e.substring(j + 1, i), e.substring(i + 1).toLong)
    }.toMap

  private def parseTxns(entries: Seq[String]): Seq[(String, Long)] =
    entries.map { e =>
      val i = e.lastIndexOf('|')
      e.substring(0, i) -> e.substring(i + 1).toLong
    }

  /** "path|col|sidecar|m|k[|s][|l]" → path → col → ref ('|'-free
    * fields, enforced at commit, make rightmost-split parsing
    * unambiguous; the optional trailing "|s" marks a string-keyed
    * bloom, "|l" a legacy-untyped one — neither can be confused with
    * k, which is numeric). `legacyDefault` is true when the source
    * json predates the `fmt` version field: every untagged ref in it
    * was written before key-type tags existed and parses legacy. */
  private def parseBlooms(entries: Seq[String],
      legacyDefault: Boolean): Map[String, Map[String, BloomRef]] =
    entries.map { raw =>
      var e = raw
      var str = false
      var legacy = legacyDefault
      var more = true
      while (more) {
        if (e.endsWith("|l")) { legacy = true; e = e.dropRight(2) }
        else if (e.endsWith("|s")) { str = true; e = e.dropRight(2) }
        else more = false
      }
      val i = e.lastIndexOf('|'); val j = e.lastIndexOf('|', i - 1)
      val k = e.lastIndexOf('|', j - 1); val l = e.lastIndexOf('|', k - 1)
      (e.substring(0, l), e.substring(l + 1, k),
        BloomRef(e.substring(l + 1, k), e.substring(k + 1, j),
          e.substring(j + 1, i).toInt, e.substring(i + 1).toInt, str,
          // a TYPE-TAGGED ref's key type is known even in a legacy
          // json — quarantine applies to untagged refs only
          legacy = legacy && !str))
    }.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap

  /** Replay seeded from the nearest checkpoint ≤ `version` (full
    * replay from 0 when none): fold the remaining manifests' adds,
    * removes, per-file stats (single- and named-column) and txn
    * markers in commit order. A removed file drops its stats; a
    * stats-less add has no entry (never skippable); a writer's txn
    * folds as the MAX batchId seen (batchIds are monotone per app, so
    * max = latest even across a checkpoint + tail seam). */
  /** STRICT range decomposition of a CHECK expression (r17): the
    * per-column closed bounds that, when every add's [min, max]
    * stats sit inside them, PROVE the whole constraint holds for
    * every committed row. Unlike [[ManifestFileIndex.ranges]] (which
    * may extract a PARTIAL bound — sound for pruning, where keeping
    * more files is safe), proving requires the expression to
    * decompose ENTIRELY into integral range conjuncts: any
    * unsupported shape (OR, NOT, IN — stats containment does not
    * prove set membership — casts, IS NOT NULL, multi-column
    * arithmetic) yields None and the commit must be row-validated
    * instead. Parsed session-free via CatalystSqlParser, same as
    * [[requireSatisfies]]'s `expr()` would resolve it. */
  private[sources] def provableBounds(
      sqlText: String): Option[Map[String, (Long, Long)]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def succ(v: Long) = if (v == Long.MaxValue) v else v + 1
    def pred(v: Long) = if (v == Long.MinValue) v else v - 1
    def one(c: Option[String], b: Option[(Long, Long)]) =
      for (n <- c; i <- b) yield Map(n -> i)
    def merge(x: Map[String, (Long, Long)], y: Map[String, (Long, Long)]) =
      (x.keySet ++ y.keySet).map { c =>
        val (l1, h1) = x.getOrElse(c, (Long.MinValue, Long.MaxValue))
        val (l2, h2) = y.getOrElse(c, (Long.MinValue, Long.MaxValue))
        c -> (math.max(l1, l2), math.min(h1, h2))
      }.toMap
    def walk(e: Expression): Option[Map[String, (Long, Long)]] = e match {
      case And(a, b) => for (x <- walk(a); y <- walk(b)) yield merge(x, y)
      case EqualTo(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, v)))
      case EqualTo(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, v)))
      case GreaterThan(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (succ(v), Long.MaxValue)))
      case GreaterThan(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, pred(v))))
      case GreaterThanOrEqual(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, Long.MaxValue)))
      case GreaterThanOrEqual(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, v)))
      case LessThan(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, pred(v))))
      case LessThan(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (succ(v), Long.MaxValue)))
      case LessThanOrEqual(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, v)))
      case LessThanOrEqual(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, Long.MaxValue)))
      case _ => None
    }
    scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)).toOption.flatMap(walk)
  }

  /** DOUBLE twin of [[provableBounds]] (r17): the same strict range
    * decomposition with bounds in [[ManifestFileIndex.dblKey]] IMAGE
    * space, provable against a file's `dbl`-tagged stats. Literals of
    * ANY numeric type participate through `.toDouble` — exactly the
    * coercion Spark applies when comparing a double column to a
    * non-double numeric literal (decimal SQL literals like `0.5`
    * parse as DecimalType; huge longs convert lossily — in BOTH
    * Spark's comparison and here, so the proof decides by the same
    * arithmetic the row filter does). Image adjacency makes the
    * strict-bound succ/pred arithmetic exact; NaN's image above
    * +Infinity makes proofs over NaN-bearing files match Spark's
    * "NaN is larger than any other value" ordering. Any unsupported
    * shape yields None (row-validate and attest). */
  private[sources] def provableDblBounds(
      sqlText: String): Option[Map[String, (Long, Long)]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def img(d: Double): Long = ManifestFileIndex.dblKey(d)
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(img(v.toDouble))
      case Literal(v: Short, _) => Some(img(v.toDouble))
      case Literal(v: Int, _) => Some(img(v.toDouble))
      case Literal(v: Long, _) => Some(img(v.toDouble))
      case Literal(v: Float, FloatType) => Some(img(v.toDouble))
      case Literal(v: Double, DoubleType) => Some(img(v))
      case Literal(v: org.apache.spark.sql.types.Decimal,
        _: DecimalType) => Some(img(v.toDouble))
      case _ => None
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def succ(v: Long) = if (v == Long.MaxValue) v else v + 1
    def pred(v: Long) = if (v == Long.MinValue) v else v - 1
    def one(c: Option[String], b: Option[(Long, Long)]) =
      for (n <- c; i <- b) yield Map(n -> i)
    def merge(x: Map[String, (Long, Long)], y: Map[String, (Long, Long)]) =
      (x.keySet ++ y.keySet).map { c =>
        val (l1, h1) = x.getOrElse(c, (Long.MinValue, Long.MaxValue))
        val (l2, h2) = y.getOrElse(c, (Long.MinValue, Long.MaxValue))
        c -> (math.max(l1, l2), math.min(h1, h2))
      }.toMap
    def walk(e: Expression): Option[Map[String, (Long, Long)]] = e match {
      case And(a, b) => for (x <- walk(a); y <- walk(b)) yield merge(x, y)
      case EqualTo(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, v)))
      case EqualTo(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, v)))
      case GreaterThan(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (succ(v), Long.MaxValue)))
      case GreaterThan(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, pred(v))))
      case GreaterThanOrEqual(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, Long.MaxValue)))
      case GreaterThanOrEqual(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, v)))
      case LessThan(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, pred(v))))
      case LessThan(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (succ(v), Long.MaxValue)))
      case LessThanOrEqual(a, l) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (Long.MinValue, v)))
      case LessThanOrEqual(l, a) if nameOf(a).isDefined =>
        one(nameOf(a), lit(l).map(v => (v, Long.MaxValue)))
      case _ => None
    }
    scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)).toOption.flatMap(walk)
  }

  /** STRING twin of [[provableBounds]] (r17): decompose a CHECK into
    * atomic string comparisons (col OP 'literal', AND only) provable
    * from per-file UTF-8 string bounds. Returned atoms are
    * (column, op, literal) with op ∈ {"=", ">=", ">", "<=", "<"};
    * proof per add: `=` needs min==lit==max, `>=`/`>` need min ≥/> lit,
    * `<=`/`<` need max ≤/< lit — exclusive bounds prove EXACTLY here
    * (max < v ⟺ every value < v in a total order), unlike pruning
    * where they had to widen. Any unsupported shape yields None. */
  private[sources] def provableStrAtoms(
      sqlText: String): Option[Seq[(String, String, String)]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def lit(e: Expression): Option[String] = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => Some(v.toString)
      case _ => None
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def atom(c: Option[String], op: String, l: Option[String]) =
      for (n <- c; v <- l) yield Seq((n, op, v))
    def flip(op: String) = op match {
      case ">=" => "<="; case ">" => "<"; case "<=" => ">="
      case "<" => ">"; case other => other
    }
    def walk(e: Expression): Option[Seq[(String, String, String)]] =
      e match {
        case And(a, b) => for (x <- walk(a); y <- walk(b)) yield x ++ y
        case EqualTo(a, l) if nameOf(a).isDefined =>
          atom(nameOf(a), "=", lit(l))
        case EqualTo(l, a) if nameOf(a).isDefined =>
          atom(nameOf(a), "=", lit(l))
        case GreaterThanOrEqual(a, l) if nameOf(a).isDefined =>
          atom(nameOf(a), ">=", lit(l))
        case GreaterThanOrEqual(l, a) if nameOf(a).isDefined =>
          atom(nameOf(a), flip(">="), lit(l))
        case GreaterThan(a, l) if nameOf(a).isDefined =>
          atom(nameOf(a), ">", lit(l))
        case GreaterThan(l, a) if nameOf(a).isDefined =>
          atom(nameOf(a), flip(">"), lit(l))
        case LessThanOrEqual(a, l) if nameOf(a).isDefined =>
          atom(nameOf(a), "<=", lit(l))
        case LessThanOrEqual(l, a) if nameOf(a).isDefined =>
          atom(nameOf(a), flip("<="), lit(l))
        case LessThan(a, l) if nameOf(a).isDefined =>
          atom(nameOf(a), "<", lit(l))
        case LessThan(l, a) if nameOf(a).isDefined =>
          atom(nameOf(a), flip("<"), lit(l))
        case _ => None
      }
    scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)).toOption.flatMap(walk)
  }

  /** TYPE-RESOLVED decomposition of a CHECK expression (r18; retires
    * the §8.3.4-12 attest fallback for mixed-type constraints): the
    * log's committed `schemaDdl` resolves each referenced column's
    * TYPE, so a constraint mixing an integral and a fractional (or
    * string) column in one AND-conjunction decomposes into
    * per-column proof obligations each provable against ITS
    * matching-typed stat — where the session-free single-type
    * decompositions above must prove the WHOLE expression under one
    * stat type and therefore fall back to attest on any mix.
    * Returns (raw-long bounds, double-image bounds, string atoms);
    * a commit proves when EVERY obligation holds for every add.
    * Type families follow the writer's stats contract: integral /
    * timestamp / date columns prove against untagged long stats
    * from integral literals; double/float columns against
    * dbl-tagged image stats from any numeric literal (the same
    * `.toDouble` coercion Spark's comparison applies); string
    * columns against UTF-8 string bounds. Any unsupported shape
    * (OR, NOT, IN, a column absent from the declared schema, a
    * literal outside the column's family) yields None —
    * row-validate and attest. */
  private[sources] def provableTypedBounds(sqlText: String,
      schema: org.apache.spark.sql.types.StructType)
      : Option[(Map[String, (Long, Long)], Map[String, (Long, Long)],
          Seq[(String, String, String)], Seq[String])] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val types: Map[String, DataType] =
      schema.fields.iterator.map(f => f.name -> f.dataType).toMap
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def intLit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    def dblLit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(ManifestFileIndex.dblKey(v.toDouble))
      case Literal(v: Short, _) => Some(ManifestFileIndex.dblKey(v.toDouble))
      case Literal(v: Int, _) => Some(ManifestFileIndex.dblKey(v.toDouble))
      case Literal(v: Long, _) => Some(ManifestFileIndex.dblKey(v.toDouble))
      case Literal(v: Float, FloatType) =>
        Some(ManifestFileIndex.dblKey(v.toDouble))
      case Literal(v: Double, DoubleType) => Some(ManifestFileIndex.dblKey(v))
      case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
        Some(ManifestFileIndex.dblKey(v.toDouble))
      case _ => None
    }
    def strLit(e: Expression): Option[String] = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        StringType) => Some(v.toString)
      case _ => None
    }
    def succ(v: Long) = if (v == Long.MaxValue) v else v + 1
    def pred(v: Long) = if (v == Long.MinValue) v else v - 1
    // one typed proof obligation: exactly one of the four shapes
    final case class Ob(longB: Option[(String, (Long, Long))] = None,
        dblB: Option[(String, (Long, Long))] = None,
        strA: Option[(String, String, String)] = None,
        notNull: Option[String] = None)
    def rangeOf(op: String, v: Long): (Long, Long) = op match {
      case "=" => (v, v)
      case ">" => (succ(v), Long.MaxValue)
      case ">=" => (v, Long.MaxValue)
      case "<" => (Long.MinValue, pred(v))
      case "<=" => (Long.MinValue, v)
    }
    def atom(c: String, op: String, l: Expression): Option[Ob] =
      types.get(c).flatMap {
        case ByteType | ShortType | IntegerType | LongType |
             TimestampType | DateType =>
          intLit(l).map(v => Ob(longB = Some(c -> rangeOf(op, v))))
        case DoubleType | FloatType =>
          // image adjacency makes succ/pred exact in image space
          dblLit(l).map(v => Ob(dblB = Some(c -> rangeOf(op, v))))
        case StringType => strLit(l).map(v => Ob(strA = Some((c, op, v))))
        case _ => None
      }
    def flip(op: String) = op match {
      case ">=" => "<="; case ">" => "<"; case "<=" => ">="
      case "<" => ">"; case other => other
    }
    def cmp(a: Expression, l: Expression, op: String): Option[Seq[Ob]] =
      nameOf(a).flatMap(atom(_, op, l)).map(Seq(_))
    def walk(e: Expression): Option[Seq[Ob]] = e match {
      case And(a, b) => for (x <- walk(a); y <- walk(b)) yield x ++ y
      // IS NOT NULL atoms prove from null counts regardless of type
      // (the column must still resolve in the declared schema)
      case IsNotNull(a) => nameOf(a).filter(types.contains)
        .map(c => Seq(Ob(notNull = Some(c))))
      case EqualTo(a, l) if nameOf(a).isDefined => cmp(a, l, "=")
      case EqualTo(l, a) if nameOf(a).isDefined => cmp(a, l, "=")
      case GreaterThan(a, l) if nameOf(a).isDefined => cmp(a, l, ">")
      case GreaterThan(l, a) if nameOf(a).isDefined =>
        cmp(a, l, flip(">"))
      case GreaterThanOrEqual(a, l) if nameOf(a).isDefined =>
        cmp(a, l, ">=")
      case GreaterThanOrEqual(l, a) if nameOf(a).isDefined =>
        cmp(a, l, flip(">="))
      case LessThan(a, l) if nameOf(a).isDefined => cmp(a, l, "<")
      case LessThan(l, a) if nameOf(a).isDefined => cmp(a, l, flip("<"))
      case LessThanOrEqual(a, l) if nameOf(a).isDefined =>
        cmp(a, l, "<=")
      case LessThanOrEqual(l, a) if nameOf(a).isDefined =>
        cmp(a, l, flip("<="))
      case _ => None
    }
    def intersect(bs: Seq[(String, (Long, Long))])
        : Map[String, (Long, Long)] =
      bs.groupBy(_._1).view.mapValues(_.map(_._2).reduce { (x, y) =>
        (math.max(x._1, y._1), math.min(x._2, y._2)) }).toMap
    scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)).toOption.flatMap(walk).map { obs =>
      (intersect(obs.flatMap(_.longB)), intersect(obs.flatMap(_.dblB)),
        obs.flatMap(_.strA), obs.flatMap(_.notNull))
    }
  }

  /** NOT-NULL decomposition of a CHECK expression (r18): the columns
    * an AND-conjunction of bare `col IS NOT NULL` atoms constrains —
    * provable from the manifest's per-file NULL COUNTS (nulls = 0
    * proves the constraint for every committed row; `NULL IS NOT
    * NULL` evaluates FALSE, so a null row VIOLATES, and the count is
    * exact). Closes the "non-range constraints are never
    * stats-provable" attest fallback for the most common non-range
    * shape. Any other shape yields None. */
  private[sources] def provableNotNullAtoms(
      sqlText: String): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def walk(e: Expression): Option[Seq[String]] = e match {
      case And(a, b) => for (x <- walk(a); y <- walk(b)) yield x ++ y
      case IsNotNull(a) => nameOf(a).map(Seq(_))
      case _ => None
    }
    scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)).toOption.flatMap(walk)
  }

  /** Does `st` prove the string atom (op, lit) for every non-null
    * row of its file? */
  private def strAtomProven(st: StrStat, op: String,
      litVal: String): Boolean = {
    val cmpMin = ManifestFileIndex.utf8Cmp(st.min, litVal)
    val cmpMax = ManifestFileIndex.utf8Cmp(st.max, litVal)
    op match {
      case "=" => cmpMin == 0 && cmpMax == 0
      case ">=" => cmpMin >= 0
      case ">" => cmpMin > 0
      case "<=" => cmpMax <= 0
      case "<" => cmpMax < 0
    }
  }

  /** METADATA-ONLY fold (r18): the declared schema DDL and CHECK set
    * in force at `version`, resolved WITHOUT building the live-file
    * maps — checkpoint-seeded like [[replayIn]], but touching only
    * the `schema` and `checks` fields, so the commit gate's
    * per-commit cost stays flat in table size (a full replay of a
    * 1M-file checkpoint is a multi-second parse; schema/checks are a
    * few hundred bytes of it). Same resolution semantics: latest
    * declaration wins, the `-` sentinel clears the check set. */
  /** Decode a manifest/checkpoint `schema` field (base64 DDL; the
    * LAST entry wins) — shared by every fold site so the format has
    * one reader. None = the field declared nothing. */
  private def decodeSchemaField(entries: Seq[String]): Option[String] =
    entries.lastOption.map(b64 => new String(
      java.util.Base64.getDecoder.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Decode a `checks` field: None = no declaration in this record,
    * Some(empty) = the explicit `-` drop-all sentinel, Some(set) =
    * the declared set. Shared by every fold site. */
  private def decodeChecksField(
      entries: Seq[String]): Option[Map[String, String]] =
    if (entries.isEmpty) None
    else Some(
      if (entries == Seq("-")) Map.empty
      else entries.map { e =>
        val i = e.lastIndexOf('|')
        e.substring(0, i) -> new String(
          java.util.Base64.getDecoder.decode(e.substring(i + 1)),
          java.nio.charset.StandardCharsets.UTF_8)
      }.toMap)

  /** Schema DDL + CHECK set as of `version` via a METADATA-ONLY fold:
    * the KB checkpoint sibling (or the full checkpoint when the
    * sibling is missing) plus the tail manifests — the r18 fix that
    * keeps the gated-commit hot path flat at log scale. NOTE (r18
    * advice): the flatness depends on checkpoints EXISTING — a table
    * committed without any [[CheckpointPolicy]] still folds every
    * manifest per gated commit, the same O(versions) shape
    * [[replayIn]] has always had there. Acceptable by policy (the
    * probe's measured per-manifest cost is ~µs and such tables are
    * short-history by construction), but a long-lived gated table
    * should commit with a policy — the 1M-file probe's 94 ms/commit
    * number is the WITH-checkpoint path. */
  private def metaAsOfIn(store: LogStore,
      version: Long): (Option[String], Map[String, String]) = {
    var schemaDdl: Option[String] = None
    var checks = Map.empty[String, String]
    def fold(json: String): Unit = {
      decodeSchemaField(field(json, "schema"))
        .foreach(d => schemaDdl = Some(d))
      decodeChecksField(field(json, "checks")).foreach(checks = _)
    }
    // ONE directory listing serves the sibling lookup AND both
    // version scans (this fold runs per gated commit — the hot path
    // the r18 sibling exists for)
    val listing = store.list()
    val manifestVs = listing.filter(ManifestRe.matches)
      .map(_.stripSuffix(".json").toLong).sorted
    val ckptVs = listing.filter(CheckpointRe.matches)
      .map(_.stripSuffix(".checkpoint.json").toLong).sorted
    val ckpt = ckptVs.filter(_ <= version).lastOption
    ckpt.foreach { cv =>
      // prefer the KB-sized metadata sibling (r18); a checkpoint
      // published before the sibling existed (or whose sibling was
      // lost to a crash between the two publishes) falls back to the
      // full checkpoint read — same content, just more bytes
      val json =
        if (listing.contains(checkpointMetaName(cv)))
          store.read(checkpointMetaName(cv))
        else store.read(checkpointName(cv))
      fold(json)
    }
    manifestVs
      .filter(v => v <= version && ckpt.forall(v > _))
      .foreach(v => fold(store.read(manifestName(v))))
    (schemaDdl, checks)
  }

  private[sources] def replayIn(store: LogStore, version: Long): Replay = {
    // concrete HashMaps so the columnar-checkpoint fold can PRESIZE
    // them (r20): a 10M-entry build pays ~20 doubling rehashes
    // otherwise — measured 42% of the put cost at that scale
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val stats = scala.collection.mutable.HashMap.empty[String, FileStat]
    val colStats =
      scala.collection.mutable.HashMap.empty[String, Map[String, FileStat]]
    val strColStats =
      scala.collection.mutable.HashMap.empty[String, Map[String, StrStat]]
    val nullStats =
      scala.collection.mutable.HashMap.empty[String, Map[String, NullStat]]
    val blooms =
      scala.collection.mutable.HashMap.empty[String, Map[String, BloomRef]]
    val txns = scala.collection.mutable.HashMap.empty[String, Long]
    val dvs = scala.collection.mutable.HashMap.empty[String, DvRef]
    // a fold from genesis decides the dvs-ever bit exactly; a
    // checkpoint-seeded fold inherits the checkpoint's bit (or stays
    // undecided on a legacy checkpoint unless its refs prove "ever")
    var dvsEver: Option[Boolean] = Some(false)
    var schemaDdl: Option[String] = None
    def foldSchema(entries: Seq[String]): Unit =
      decodeSchemaField(entries).foreach(d => schemaDdl = Some(d))
    var checks = Map.empty[String, String]
    def foldChecks(entries: Seq[String]): Unit =
      decodeChecksField(entries).foreach(checks = _)
    def foldTxns(entries: Seq[(String, Long)]): Unit =
      entries.foreach { case (app, b) =>
        txns(app) = txns.get(app).fold(b)(math.max(_, b)) }
    val ckpt = checkpointVersionsIn(store).filter(_ <= version).lastOption
    ckpt.foreach { cv =>
      val json = store.read(checkpointName(cv))
      if (field(json, "pq").nonEmpty) {
        // columnar checkpoint (r19): the per-file state rides the
        // parquet sidecar; the JSON keeps only the scalar fields. A
        // marked checkpoint without its sidecar is impossible under
        // the publish order (sidecar first) — a missing read here is
        // genuine corruption and stays loud. Partials fold straight
        // into the replay's own mutable state (the per-file column
        // maps MERGE across partials — a file can straddle a
        // row-group boundary).
        val parts = CheckpointCodec.decodeParts(
          store.readBytes(checkpointParquetName(cv)))
        live.sizeHint(parts.iterator.map(_.files.size).sum)
        stats.sizeHint(parts.iterator.map(_.stats.size).sum)
        colStats.sizeHint(parts.iterator.map(_.colStats.size).sum)
        strColStats.sizeHint(parts.iterator.map(_.strColStats.size).sum)
        nullStats.sizeHint(parts.iterator.map(_.nullStats.size).sum)
        blooms.sizeHint(parts.iterator.map(_.blooms.size).sum)
        dvs.sizeHint(parts.iterator.map(_.dvs.size).sum)
        parts.foreach { p =>
          p.files.foreach(live.add)
          stats ++= p.stats
          dvs ++= p.dvs
          p.colStats.foreach { case (f, m) =>
            colStats(f) = colStats.getOrElse(f, Map.empty) ++ m }
          p.strColStats.foreach { case (f, m) =>
            strColStats(f) = strColStats.getOrElse(f, Map.empty) ++ m }
          p.nullStats.foreach { case (f, m) =>
            nullStats(f) = nullStats.getOrElse(f, Map.empty) ++ m }
          p.blooms.foreach { case (f, m) =>
            blooms(f) = blooms.getOrElse(f, Map.empty) ++ m }
        }
      } else {
        field(json, "files").foreach(live.add)
        stats ++= parseStats(field(json, "stats"))
        colStats ++= parseColStats(field(json, "colstats"))
        strColStats ++= parseStrColStats(field(json, "strstats"))
        nullStats ++= parseNullStats(field(json, "nullstats"))
        blooms ++= parseBlooms(field(json, "blooms"),
          legacyDefault = field(json, "fmt").isEmpty)
        dvs ++= parseDvs(field(json, "dvs"))
      }
      foldTxns(parseTxns(field(json, "txns")))
      foldSchema(field(json, "schema"))
      foldChecks(field(json, "checks"))
      // the seeding checkpoint's folded bit covers all history ≤ it;
      // a legacy checkpoint without the bit leaves the answer
      // undecided — unless its own surviving refs already prove it
      dvsEver = field(json, "dvsever").headOption match {
        case Some(bit) => Some(bit == "1")
        case None => if (dvs.nonEmpty) Some(true) else None
      }
    }
    versionsIn(store)
      .filter(v => v <= version && ckpt.forall(v > _))
      .foreach { v =>
        val json = store.read(manifestName(v))
        field(json, "removes").foreach { f =>
          live.remove(f); stats.remove(f); colStats.remove(f)
          strColStats.remove(f); nullStats.remove(f); blooms.remove(f)
          dvs.remove(f) }
        field(json, "adds").foreach(live.add)
        stats ++= parseStats(field(json, "stats"))
        colStats ++= parseColStats(field(json, "colstats"))
        strColStats ++= parseStrColStats(field(json, "strstats"))
        nullStats ++= parseNullStats(field(json, "nullstats"))
        blooms ++= parseBlooms(field(json, "blooms"),
          legacyDefault = field(json, "fmt").isEmpty)
        foldTxns(parseTxns(field(json, "txn")))
        // a later DV REPLACES the file's earlier one (each vector is
        // written as old ∪ newly-dead, so last-wins is exact); a later
        // declared SCHEMA likewise supersedes (additive evolution)
        val mDvs = parseDvs(field(json, "dvs"))
        if (mDvs.nonEmpty) dvsEver = Some(true)
        dvs ++= mDvs
        foldSchema(field(json, "schema"))
        foldChecks(field(json, "checks"))
      }
    Replay(live.toSeq, stats.toMap, colStats.toMap, blooms.toMap,
      txns.toMap, dvs.toMap, schemaDdl, checks, strColStats.toMap,
      nullStats.toMap, dvsEver)
  }

  /** TIMESTAMP time travel (r16) — `AS OF TIMESTAMP` resolved to a
    * version: the latest commit whose recorded wall-clock `commitMs`
    * is <= `tsMs` (Delta's timestamp_as_of contract: "the table as it
    * was then"). Resolution scans the SURVIVING manifests' "at"
    * fields — metadata-sized, no data IO; versions pruned behind a
    * checkpoint are no longer time-addressable (the same retention
    * contract as [[changesBetweenIn]] — pin a VERSION for reads that
    * must outlive retention), and commits that recorded no timestamp
    * are skipped. Throws when `tsMs` predates every timestamped
    * commit — "before the table existed" must be loud, never a silent
    * earliest-version read. */
  def versionAtTimestampIn(store: LogStore, tsMs: Long): Long = {
    val fromManifests = versionsIn(store).flatMap { v =>
      field(store.read(manifestName(v)), "at").headOption
        .map(at => v -> at.toLong)
    }
    // checkpoints carry their own version's stamp, so a checkpointed
    // era survives retention in the time-addressable set too
    val fromCheckpoints = checkpointVersionsIn(store).flatMap { v =>
      field(store.read(checkpointName(v)), "at").headOption
        .map(at => v -> at.toLong)
    }
    val stamped = (fromCheckpoints.toMap ++ fromManifests.toMap)
      .toSeq.sortBy(_._1)
    require(stamped.nonEmpty, "no timestamped commits in the log")
    val eligible = stamped.filter(_._2 <= tsMs)
    require(eligible.nonEmpty,
      s"timestamp $tsMs predates the earliest timestamped commit " +
        s"(at ${stamped.head._2}) — nothing existed to read")
    eligible.map(_._1).max
  }

  def versionAtTimestamp(root: String, tsMs: Long): Long =
    versionAtTimestampIn(storeFor(root), tsMs)

  /** Live data files as of `version`: checkpoint-seeded log replay.
    * Throws if `version` was never committed or has been pruned past
    * (a time-travel read must not silently resolve a neighboring
    * version). */
  def filesAsOfIn(store: LogStore, version: Long): Seq[String] = {
    val vs = versionsIn(store)
    // a checkpoint can serve its own version even after the manifests
    // it folded were pruned (the retention story checkpoints enable)
    require(vs.contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log (have: $vs)")
    replayIn(store, version).files
  }

  /** Live per-file stats as of `version` (files committed without
    * stats are absent). Same resolution rules as [[filesAsOfIn]]. */
  def statsAsOfIn(store: LogStore,
      version: Long): Map[String, FileStat] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).stats
  }

  /** Live per-file NAMED-column stats as of `version`. */
  def colStatsAsOfIn(store: LogStore,
      version: Long): Map[String, Map[String, FileStat]] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).colStats
  }

  /** EXACTLY-ONCE writer seam (Delta's txn action): the highest
    * batchId this `appId` has ever committed, resolved from the log
    * itself — so an idempotence decision survives even TOTAL loss of
    * the writer's own checkpoint. None when the writer never
    * committed (or the log is empty). */
  def lastTxnIn(store: LogStore, appId: String): Option[Long] = {
    val latest =
      (versionsIn(store) ++ checkpointVersionsIn(store)).maxOption
    latest.flatMap(v => replayIn(store, v).txns.get(appId))
  }

  /** DATA SKIPPING: the live files as of `version` that can contain a
    * row with tracked-column value in the CLOSED range [lo, hi] —
    * files whose [min, max] interval intersects it, plus every file
    * with no recorded stats (unknown means must-read; pruning is only
    * ever an optimization, never a correctness decision). The prune
    * consults manifest metadata only — at 100 TB this is the read
    * path's first and cheapest filter, ahead of parquet row-group and
    * page pruning inside the surviving files. */
  def filesMatchingIn(store: LogStore, version: Long, lo: Long,
      hi: Long): Seq[String] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    r.files.filter(f =>
      r.stats.get(f).forall(st => st.max >= lo && st.min <= hi))
  }

  /** MULTI-DIMENSIONAL data skipping: the live files as of `version`
    * that can contain a row satisfying EVERY (column, [lo, hi]) range
    * in `preds` — a file survives a predicate when its recorded
    * interval for that column intersects the range, or when it carries
    * no stats for that column (unknown = must-read, per predicate).
    * A conjunctive prune over a multi-column-clustered layout
    * (Z-order/Hilbert) is where named-column stats earn their keep:
    * 1-D stats leave every file spanning the second key's full
    * domain, so only ONE predicate of a box can ever prune. */
  def filesMatchingColsIn(store: LogStore, version: Long,
      preds: Seq[(String, Long, Long)]): Seq[String] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    r.files.filter { f =>
      val cs = r.colStats.getOrElse(f, Map.empty)
      preds.forall { case (c, lo, hi) =>
        cs.get(c).forall(st => st.max >= lo && st.min <= hi) }
    }
  }

  /** INCREMENTAL CHANGE READ — the actions committed in versions
    * (`from`, `to`], per version in commit order: the consumption
    * shape of a change-data feed (Delta's startingVersion read /
    * Iceberg's incremental scan). A downstream consumer that has
    * processed up to `from` reads ONLY the tail's adds/removes —
    * metadata first, then just the added files' data — instead of
    * re-reading the table. Requires every manifest in the range to
    * still exist (a tail pruned past `from` must fail loudly, never
    * silently skip actions — re-bootstrap from a snapshot instead). */
  def changesBetweenIn(store: LogStore, from: Long,
      to: Long): Seq[(Long, Seq[String], Seq[String])] = {
    require(from <= to, s"empty change range: ($from, $to]")
    val have = versionsIn(store).filter(v => v > from && v <= to)
    val want = (from + 1) to to
    require(have == want,
      s"change range ($from, $to] has pruned/missing manifests " +
        s"(have: $have) — re-bootstrap from a snapshot")
    have.map { v =>
      val json = store.read(manifestName(v))
      (v, field(json, "adds"), field(json, "removes"))
    }
  }

  /** OPTIMISTIC SERIALIZABLE COMMIT (r16) — the multi-writer protocol
    * over the raw [[commitIn]] primitive, the loop every real table
    * format's transaction runs (Delta's OptimisticTransaction,
    * Iceberg's commit retry): the transaction did its work against
    * snapshot `readVersion` and now publishes its actions at
    * `readVersion + 1`. When a concurrent winner already took that
    * version, the loser does NOT abort — it checks the winners'
    * actions in (`readVersion`, latest] against its own footprint and
    *
    *   - REBASES (re-publishes the SAME actions at latest+1, no
    *     recomputation) when every winner is logically disjoint:
    *     nobody removed or vectored a file this txn read (`readFiles`),
    *     is removing, or is vectoring — the blind-append-vs-anything
    *     case that dominates real write traffic;
    *   - throws [[LogicalConflict]] when a winner's removes or DVs
    *     overlap that footprint: the txn's outputs were derived from
    *     state a winner has since changed, so its actions are stale
    *     and must be re-derived from a fresh snapshot.
    *
    * Isolation level is WRITE-SERIALIZABLE (Delta's default): winner
    * APPENDS never conflict with a reader's snapshot — a txn that
    * must serialize against appends too passes the whole live set as
    * `readFiles`. Returns the version actually committed. The
    * conflict check reads only manifest metadata; `maxRetries` bounds
    * pathological rebase storms (each retry means another writer WON
    * — the log never stalls, someone always makes progress). */
  def commitSerializable(root: String, readVersion: Long,
      adds: Seq[String], removes: Seq[String], op: String,
      readFiles: Set[String] = Set.empty,
      policy: Option[CheckpointPolicy] = None,
      stats: Map[String, FileStat] = Map.empty,
      colStats: Map[String, Map[String, FileStat]] = Map.empty,
      blooms: Map[String, Map[String, BloomRef]] = Map.empty,
      txn: Option[(String, Long)] = None,
      dvs: Map[String, DvRef] = Map.empty,
      commitMs: Option[Long] = None,
      schemaDdl: Option[String] = None,
      checks: Option[Seq[(String, String)]] = None,
      attest: Boolean = false,
      strColStats: Map[String, Map[String, StrStat]] = Map.empty,
      maxRetries: Int = 20,
      nullStats: Map[String, Map[String, NullStat]] = Map.empty): Long = {
    val store = storeFor(root)
    val footprint: Set[String] =
      readFiles ++ removes ++ dvs.keySet
    var target = readVersion + 1
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      try {
        commitIn(store, target, adds, removes, op, policy, stats,
          colStats, blooms, txn, dvs, commitMs, schemaDdl, checks,
          attest, strColStats, nullStats)
        committed = target
      } catch {
        case Conflict(_) =>
          attempts += 1
          require(attempts <= maxRetries,
            s"gave up after $maxRetries rebases — every attempt lost " +
              "to a concurrent winner")
          val latest = versionsIn(store).max
          changesBetweenIn(store, readVersion, latest).foreach {
            case (v, _, wRemoves) =>
              val overlap = wRemoves.toSet.intersect(footprint)
              if (overlap.nonEmpty) throw LogicalConflict(v,
                s"winner removed files this txn depends on: $overlap")
          }
          dvChangesBetweenIn(store, readVersion, latest).foreach {
            case (v, wDvs) =>
              val overlap = wDvs.keySet.intersect(footprint)
              if (overlap.nonEmpty) throw LogicalConflict(v,
                s"winner vectored files this txn depends on: $overlap")
          }
          // METADATA conflict (r17 advice): a winner that declared a
          // new schema or CHECK set between this txn's snapshot and
          // its publish invalidates the txn's validation premises — a
          // batch gated against the OLD constraint set could rebase
          // violating rows straight past the NEW one. Delta's
          // ConflictChecker fails any txn on a concurrent metadata
          // update for exactly this reason; so do we, for every txn
          // shape (appends included — the constraint set governs
          // appends above all).
          ((readVersion + 1) to latest).foreach { v =>
            val json = store.read(manifestName(v))
            if (field(json, "schema").nonEmpty ||
                field(json, "checks").nonEmpty)
              throw LogicalConflict(v,
                "winner declared table metadata (schema/checks) — " +
                  "re-validate against the fresh snapshot")
          }
          target = latest + 1
      }
    }
    committed
  }

  /** The deletion-vector entries committed per version in
    * (`from`, `to`] — the DV half of [[changesBetweenIn]] (same loud
    * dense-range contract), for consumers that must know a version
    * changed ROWS without touching files: an append-only row feed
    * cannot replay a DV commit and must reject it, a change-image
    * feed turns its delta into delete images. */
  def dvChangesBetweenIn(store: LogStore, from: Long,
      to: Long): Seq[(Long, Map[String, DvRef])] = {
    require(from <= to, s"empty change range: ($from, $to]")
    val have = versionsIn(store).filter(v => v > from && v <= to)
    val want = (from + 1) to to
    require(have == want,
      s"change range ($from, $to] has pruned/missing manifests " +
        s"(have: $have) — re-bootstrap from a snapshot")
    have.map(v => v -> parseDvs(field(store.read(manifestName(v)), "dvs")))
  }

  def dvChangesBetween(root: String, from: Long,
      to: Long): Seq[(Long, Map[String, DvRef])] =
    dvChangesBetweenIn(storeFor(root), from, to)

  /** Live per-file bloom sidecar refs as of `version`. */
  def bloomsAsOfIn(store: LogStore,
      version: Long): Map[String, Map[String, BloomRef]] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).blooms
  }

  // ---- root-based API (POSIX binding; the callers' surface) ----

  /** POINT-LOOKUP data skipping: the live files as of `version` whose
    * bloom sidecar for `column` does not rule out `value` — plus every
    * file without a bloom for that column (must-read). Range stats
    * cannot serve this lookup when `column` is not the clustered key
    * (every file's [min, max] spans the domain); the bloom answers
    * "definitely absent" per file at the cost of reading m/8 sidecar
    * bytes for the survivors of any earlier metadata prune — at
    * 100 TB that is KBs of index per file against GBs of data. A
    * false positive wastes a read; the exact row predicate still
    * decides membership (the oracle checks rows, never the prune). */
  def filesMatchingPoint(root: String, version: Long, column: String,
      value: Long): Seq[String] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    r.files.filter { f =>
      r.blooms.getOrElse(f, Map.empty).get(column).forall { ref =>
        // a STRING-keyed bloom cannot answer a long probe (different
        // hash → false negatives = wrong pruning); mismatch = must-read
        ref.str || legacyUntypedBloom(r, f, column, ref) || {
          val bits =
            Files.readAllBytes(resolvePath(root, ref.sidecar).toPath)
          FileBloom.mightContain(bits, ref.m, ref.k, value)
        }
      }
    }
  }

  /** LEGACY-BLOOM guard (r19; r18 advice, widened by this round's
    * review): a bloom parsed UNTAGGED from a pre-`fmt` manifest
    * ([[BloomRef.legacy]]) has an unknowable key type — pre-r18
    * string blooms parse str = false, and a long-hash probe against
    * one false-negatives, i.e. silently wrong pruning. The long-probe
    * paths treat such a ref as must-read UNLESS the same file carries
    * long colStats for the column (the writer folds bloom keys and
    * stats from one canonical image, so long stats prove a long-keyed
    * fold). This subsumes the narrower string-bounds heuristic the
    * first r19 cut used: a legacy string bloom committed with NO
    * string bounds — blooms and stats are independent commit
    * parameters — is quarantined too. Newly written (fmt-2) blooms
    * are always type-tagged and never quarantined. */
  private def legacyUntypedBloom(r: Replay, f: String,
      column: String, ref: BloomRef): Boolean =
    ref.legacy &&
      !r.colStats.getOrElse(f, Map.empty).contains(column)

  /** RETAG quarantined legacy bloom refs (r20; r19 verdict next-8
    * #7): the r19 quarantine is correct but permanently costs a
    * pre-`fmt` log its long-bloom prunes — this explicit maintenance
    * op VERIFIES each legacy ref's key type and rewrites the file's
    * ref set as fmt-2 tagged in one metadata-only commit. Evidence,
    * in cost order: the file's long colStats for the column prove a
    * long-keyed fold (the writer folds bloom keys and stats from one
    * canonical image); string bounds prove a string column, hence
    * the [[FileBloom.strKey]] fold every string-bloom writer used;
    * otherwise ONE parquet footer read decides the column's physical
    * type (BINARY → string keys, INT32/INT64 → canonical longs). A
    * column the evidence cannot decide (double/absent/unreadable)
    * stays quarantined — the op only ever STRENGTHENS metadata it
    * can prove, and without running it the quarantine semantics are
    * untouched. Returns the number of refs retagged (0 = no commit
    * published). */
  def retagBlooms(root: String): Int = {
    val store = storeFor(root)
    val latest = (versionsIn(store) ++ checkpointVersionsIn(store))
      .maxOption.getOrElse(
        throw new IllegalArgumentException(s"empty log at $root"))
    val r = replayIn(store, latest)
    val footerCache =
      scala.collection.mutable.Map.empty[String, Map[String, Boolean]]
    // Some(true) = string keys, Some(false) = long keys, None = the
    // evidence cannot decide
    def keyTypeOf(f: String, c: String): Option[Boolean] = {
      val cs = r.colStats.getOrElse(f, Map.empty).get(c)
      if (cs.exists(!_.dbl)) Some(false)
      else if (r.strColStats.getOrElse(f, Map.empty).contains(c))
        Some(true)
      else footerCache.getOrElseUpdate(f,
        scala.util.Try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(
              new org.apache.hadoop.fs.Path(
                resolvePath(root, f).getAbsolutePath),
              new org.apache.hadoop.conf.Configuration())
          Using.resource(
            org.apache.parquet.hadoop.ParquetFileReader.open(in)) { pr =>
            val msg = pr.getFooter.getFileMetaData.getSchema
            (0 until msg.getFieldCount).map(msg.getType)
              .filter(_.isPrimitive).flatMap { t =>
                // the LOGICAL annotation must corroborate, not just
                // the physical type (r20 second review pass): a raw
                // un-annotated BINARY proves nothing about the key
                // fold — only a STRING column implies the strKey
                // hash every string-bloom writer used. Long keys
                // accept the writer's own canonical-image encodings
                // (plain integers, epoch-day dates, epoch-µs
                // timestamps); any other annotation (decimal, MILLIS
                // timestamps, …) stays undecidable → quarantined.
                import org.apache.parquet.schema.LogicalTypeAnnotation
                import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                val ann = t.getLogicalTypeAnnotation
                (t.asPrimitiveType().getPrimitiveTypeName, ann) match {
                  case (BINARY, a)
                      if a == LogicalTypeAnnotation.stringType() =>
                    Some(t.getName -> true)
                  case (INT64, null) | (INT32, null) =>
                    Some(t.getName -> false)
                  case (INT32, a)
                      if a == LogicalTypeAnnotation.dateType() =>
                    Some(t.getName -> false)
                  case (INT64,
                      a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
                      if a.getUnit ==
                        LogicalTypeAnnotation.TimeUnit.MICROS =>
                    Some(t.getName -> false)
                  case (INT32,
                      a: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if a.getBitWidth == 32 && a.isSigned =>
                    Some(t.getName -> false)
                  case (INT64,
                      a: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if a.getBitWidth == 64 && a.isSigned =>
                    Some(t.getName -> false)
                  case _ => None
                }
              }.toMap
          }
        }.getOrElse(Map.empty)).get(c)
    }
    val retagged = r.files.flatMap { f =>
      val bs = r.blooms.getOrElse(f, Map.empty)
      if (!bs.valuesIterator.exists(_.legacy)) None
      else {
        val newBs = bs.map { case (c, ref) =>
          if (!ref.legacy) c -> ref
          else keyTypeOf(f, c) match {
            case Some(str) => c -> ref.copy(str = str, legacy = false)
            case None => c -> ref
          }
        }
        if (newBs == bs) None else Some(f -> newBs)
      }
    }.toMap
    if (retagged.isEmpty) 0
    else {
      commitIn(store, latest + 1, Seq.empty, Seq.empty,
        op = "retag_blooms", blooms = retagged)
      retagged.iterator.map { case (f, nb) =>
        val old = r.blooms(f)
        nb.count { case (c, ref) => old(c) != ref }
      }.sum
    }
  }

  /** STRING point-lookup prune (r17): the live files whose bloom
    * for `column` might contain the STRING `value` — keyed through
    * [[FileBloom.strKey]] (the same FNV-1a 64 the writer folds), so
    * an equality on an UNclustered string column (a tag, a URL host,
    * a user agent) prunes to the definitely-possible files where
    * UTF-8 bounds — which every file's interval would contain —
    * prune nothing. String bounds compose when present; bloom-less,
    * bound-less files are must-read. */
  def filesMatchingStrPoint(root: String, version: Long,
      column: String, value: String): Seq[String] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    val key = FileBloom.strKey(value)
    r.files.filter { f =>
      val boundsMaybe =
        r.strColStats.getOrElse(f, Map.empty).get(column).forall(st =>
          ManifestFileIndex.utf8Cmp(value, st.min) >= 0 &&
          ManifestFileIndex.utf8Cmp(value, st.max) <= 0)
      lazy val bloomMaybe =
        r.blooms.getOrElse(f, Map.empty).get(column).forall { ref =>
          // only a string-keyed bloom can answer a strKey probe
          !ref.str || {
            val bits =
              Files.readAllBytes(resolvePath(root, ref.sidecar).toPath)
            FileBloom.mightContain(bits, ref.m, ref.k, key)
          }
        }
      boundsMaybe && bloomMaybe
    }
  }

  /** Snapshot read pruned by [[filesMatchingStrPoint]]; the caller
    * still applies the exact equality predicate (a bloom false
    * positive costs one file's IO, never a row). Falls back to every
    * live file when nothing matches. */
  def readVersionStrPoint(spark: SparkSession, root: String,
      version: Long, column: String, value: String): DataFrame = {
    val matching = filesMatchingStrPoint(root, version, column, value)
    val r = replayIn(storeFor(root), version)
    val declared = r.schemaDdl
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    if (matching.isEmpty)
      // DEFINITELY ABSENT everywhere — the miss case the bloom
      // exists for must not degrade to a full-table scan (review
      // finding, r17): shape the empty answer from one file's
      // metadata at zero row cost
      readFilesIndexed(spark, root, r.files.take(1),
        declaredSchema = declared).limit(0)
    else
      readFilesIndexed(spark, root, matching,
        dvs = r.dvs.filter { case (f, _) => matching.contains(f) },
        declaredSchema = declared, nullStats = r.nullStats)
  }

  /** DYNAMIC FILE PRUNING (r16) — the dim-driven sibling of
    * [[filesMatchingColsIn]]: the live files as of `version` that can
    * contain ANY of `keys` in `column`, decided from the manifest's
    * metadata indexes with BOTH classes composing per file:
    *
    *   - range stats rule a file out when NO key lands in its
    *     [min, max] interval;
    *   - a bloom sidecar rules it out when EVERY key is definitely
    *     absent (bits read once per file, KBs);
    *   - a file carrying neither index for `column` is must-read.
    *
    * This is the file-level analogue of dynamic partition pruning
    * for a join whose key is NOT the layout key (Delta's dynamic file
    * pruning): the dim side's key set — known only at runtime — picks
    * the fact files, so a fact⋈dim on a 100 TB unpartitioned table
    * reads the files that can match, not the table. The key set is
    * the join's SMALL side by definition (it would be broadcast
    * anyway); callers bound it — see [[readVersionKeys]]. */
  def filesMatchingKeysIn(store: LogStore, root: String, version: Long,
      column: String, keys: Seq[Long]): Seq[String] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    require(keys.nonEmpty, "dynamic file pruning needs a non-empty key set")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    val sorted = keys.distinct.sorted
    r.files.filter { f =>
      val statsMaybe = r.colStats.getOrElse(f, Map.empty).get(column)
        .forall(st => sorted.exists(k => k >= st.min && k <= st.max))
      lazy val bloomMaybe = r.blooms.getOrElse(f, Map.empty).get(column)
        .forall { ref =>
          // string-keyed (tagged) and legacy-untyped (quarantined)
          // blooms cannot answer long probes
          ref.str || legacyUntypedBloom(r, f, column, ref) || {
            val bits =
              Files.readAllBytes(resolvePath(root, ref.sidecar).toPath)
            sorted.exists(k =>
              FileBloom.mightContain(bits, ref.m, ref.k, k))
          }
        }
      statsMaybe && bloomMaybe // each class can independently rule out
    }
  }

  /** STRING-keyed dynamic file pruning (r17): the live files as of
    * `version` whose `column` string bounds can contain ANY of
    * `keys` in UTF-8 byte order — the [[filesMatchingKeysIn]]
    * sibling for string layout keys (no bloom class: blooms are
    * long-keyed; bounds-less files are must-read). */
  def filesMatchingStrKeysIn(store: LogStore, root: String,
      version: Long, column: String, keys: Seq[String]): Seq[String] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    require(keys.nonEmpty, "dynamic file pruning needs a non-empty key set")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    val distinct = keys.distinct
    val hashed = distinct.map(FileBloom.strKey)
    r.files.filter { f =>
      val boundsMaybe =
        r.strColStats.getOrElse(f, Map.empty).get(column).forall(st =>
          distinct.exists(k =>
            ManifestFileIndex.utf8Cmp(k, st.min) >= 0 &&
            ManifestFileIndex.utf8Cmp(k, st.max) <= 0))
      // a string bloom (r17, FileBloom.strKey-keyed) composes: the
      // file survives only if SOME key might be present; a long-keyed
      // bloom cannot answer strKey probes (mismatch = must-read)
      lazy val bloomMaybe =
        r.blooms.getOrElse(f, Map.empty).get(column).forall { ref =>
          !ref.str || {
            val bits =
              Files.readAllBytes(resolvePath(root, ref.sidecar).toPath)
            hashed.exists(k =>
              FileBloom.mightContain(bits, ref.m, ref.k, k))
          }
        }
      boundsMaybe && bloomMaybe
    }
  }

  /** The declared schema as of `version` as a StructType, for the
    * prune-helper readers — every snapshot-shaped read must plan
    * under it so evolved tables resolve mixed generations (r17). */
  private def declaredAsOf(root: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    replayIn(storeFor(root), version).schemaDdl
      .map(org.apache.spark.sql.types.StructType.fromDDL)

  /** ONE-replay indexed read over a pre-pruned file list: stats, DV
    * refs and the declared schema all come from a single fold of the
    * log (the prune helpers previously replayed 3-4 times per read —
    * review finding, r17). */
  private def readPrunedIndexed(spark: SparkSession, root: String,
      version: Long, files: Seq[String]): DataFrame = {
    val r = replayIn(storeFor(root), version)
    // set-membership, not Seq scans: dvs x files is quadratic at the
    // 10M-file decade (r20)
    val fileSet = files.toSet
    readFilesIndexed(spark, root, files, r.colStats,
      r.dvs.filter { case (f, _) => fileSet(f) },
      r.schemaDdl.map(org.apache.spark.sql.types.StructType.fromDDL),
      r.nullStats)
  }

  /** Snapshot read AS OF `version` pruned by a RUNTIME key set from
    * `keys` (one column of join keys — the dim side of a fact⋈dim):
    * collects the distinct keys (loudly bounded by `maxKeys`; the dim
    * side of a dynamic-file-pruning join is broadcast-sized by
    * definition, and a dim that outgrows the bound should use the
    * row-level bloom filter — graft.ops.RuntimeFilters — instead),
    * prunes files through [[filesMatchingKeysIn]], and plans the
    * survivors through the manifest index. The join itself still
    * applies exact equality — the prune only shrinks the scan, so
    * false positives cost IO, never correctness. */
  /** The plan-bounded dim-key collect (r20; r19 verdict what's-wrong
    * #1): a corpus-sized keys frame used to materialize on the driver
    * BEFORE the loud bound fired — limit(maxKeys + 2) caps the
    * collect inside the plan, the same trick the replica sync's key
    * collect uses. distinct() yields at most ONE null row and a null
    * key never matches an equi-join, so dropping nulls keeps the
    * prune exact while the +2 window keeps the non-null count
    * decidable at the bound (a null inside a +1 window could shrink
    * a TRUNCATED set back under it). Returns ≤ maxKeys + 2 rows BY
    * CONSTRUCTION — the seam the over-bound spec pins. */
  private[sources] def collectBoundedKeys(keys: DataFrame,
      maxKeys: Int): Seq[org.apache.spark.sql.Row] =
    keys.distinct().limit(maxKeys + 2).collect().toSeq
      .filterNot(_.isNullAt(0))

  def readVersionKeys(spark: SparkSession, root: String, version: Long,
      column: String, keys: DataFrame, maxKeys: Int = 100000): DataFrame = {
    val k = collectBoundedKeys(keys, maxKeys).map(_.getLong(0))
    require(k.size <= maxKeys,
      s"dim key set has more than $maxKeys keys — too large for " +
        "file-level pruning; use a row-level runtime bloom filter instead")
    val matching =
      filesMatchingKeysIn(storeFor(root), root, version, column, k)
    val files = if (matching.nonEmpty) matching else filesAsOf(root, version)
    readPrunedIndexed(spark, root, version, files)
  }

  /** STRING twin of [[readVersionKeys]] (r17): snapshot read pruned by
    * a runtime STRING key set through [[filesMatchingStrKeysIn]] —
    * dynamic file pruning for category/language/country-style join
    * keys, where the dim's keys are only known after a runtime
    * computation. Same loud dim-size bound; the join still applies
    * exact equality, so the prune only shrinks IO. */
  def readVersionStrKeys(spark: SparkSession, root: String,
      version: Long, column: String, keys: DataFrame,
      maxKeys: Int = 100000): DataFrame = {
    // plan-bounded like the long twin above (r20): the limit caps the
    // driver materialization itself, not just the post-hoc check
    val k = collectBoundedKeys(keys, maxKeys).map(_.getString(0))
    require(k.nonEmpty, "dynamic file pruning needs a non-empty key set")
    require(k.size <= maxKeys,
      s"dim key set has more than $maxKeys keys — too large for " +
        "file-level pruning; use a row-level runtime bloom filter instead")
    val matching =
      filesMatchingStrKeysIn(storeFor(root), root, version, column, k)
    val files = if (matching.nonEmpty) matching else filesAsOf(root, version)
    readPrunedIndexed(spark, root, version, files)
  }

  /** Snapshot read AS OF `version` pruned to the files whose bloom for
    * `column` might contain `value` (see [[filesMatchingPoint]]); the
    * caller still applies the exact equality predicate. Falls back to
    * every live file when nothing matches. */
  def readVersionPoint(spark: SparkSession, root: String, version: Long,
      column: String, value: Long): DataFrame = {
    val matching = filesMatchingPoint(root, version, column, value)
    val files = if (matching.nonEmpty) matching else filesAsOf(root, version)
    readPrunedIndexed(spark, root, version, files)
  }

  def commit(root: String, version: Long, adds: Seq[String],
      removes: Seq[String], op: String,
      policy: Option[CheckpointPolicy] = None,
      stats: Map[String, FileStat] = Map.empty,
      colStats: Map[String, Map[String, FileStat]] = Map.empty,
      blooms: Map[String, Map[String, BloomRef]] = Map.empty,
      txn: Option[(String, Long)] = None,
      dvs: Map[String, DvRef] = Map.empty,
      commitMs: Option[Long] = None,
      schemaDdl: Option[String] = None,
      checks: Option[Seq[(String, String)]] = None,
      attest: Boolean = false,
      strColStats: Map[String, Map[String, StrStat]] = Map.empty,
      nullStats: Map[String, Map[String, NullStat]] = Map.empty): Unit =
    commitIn(storeFor(root), version, adds, removes, op, policy, stats,
      colStats, blooms, txn, dvs, commitMs, schemaDdl, checks, attest,
      strColStats, nullStats)

  /** Live per-file deletion-vector refs as of `version` (files without
    * a DV are absent — every row is live). */
  def dvsAsOfIn(store: LogStore, version: Long): Map[String, DvRef] = {
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    val live = r.files.toSet
    r.dvs.filter { case (f, _) => live(f) }
  }

  def dvsAsOf(root: String, version: Long): Map[String, DvRef] =
    dvsAsOfIn(storeFor(root), version)

  def bloomsAsOf(root: String,
      version: Long): Map[String, Map[String, BloomRef]] =
    bloomsAsOfIn(storeFor(root), version)

  def changesBetween(root: String, from: Long,
      to: Long): Seq[(Long, Seq[String], Seq[String])] =
    changesBetweenIn(storeFor(root), from, to)

  /** The rows ADDED in versions (`from`, `to`] with their commit
    * version as `_commit_version` — the data half of the incremental
    * read, correct as a row-level change feed for APPEND-ONLY commits
    * (a rewriting commit's adds contain carried rows too; consumers of
    * rewriting tables diff snapshots — `lake_snapshot_diff` — or need
    * per-row CDC columns, which this miniature format does not carry). */
  def readChanges(spark: SparkSession, root: String, from: Long,
      to: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // evolved ranges (r17): plan every per-version frame under the
    // `to` snapshot's declared schema, like the image feed — the
    // union across a schema-evolution boundary would otherwise crash,
    // and pre-evolution rows correctly surface NULL for new columns
    val declared = replayIn(storeFor(root), to).schemaDdl
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    val perVersion = changesBetween(root, from, to).collect {
      case (v, adds, _) if adds.nonEmpty =>
        declared.fold(spark.read)(d => spark.read.schema(d))
          .parquet(adds.map(f =>
            resolvePath(root, f).getAbsolutePath): _*)
          .withColumn("_commit_version", lit(v))
    }
    require(perVersion.nonEmpty,
      s"no added files in ($from, $to] — nothing to read")
    perVersion.reduce(_.unionByName(_))
      .select(col("_commit_version") +:
        perVersion.head.columns.filter(_ != "_commit_version")
          .map(col).toSeq: _*)
  }

  /** The rows of `files` at exactly the row indexes each file's NEW
    * vector added over its OLD one — a MOR delete's per-row death
    * certificates, read as a broadcast SEMI join against the delta
    * pairs (decoded distributed, one task per sidecar, delta-sized
    * never table-sized). `entries`: file → (new sidecar, old sidecar
    * or empty). */
  private def readDvDeltaRows(spark: SparkSession, root: String,
      entries: Seq[(String, String, String)],
      declaredSchema: Option[org.apache.spark.sql.types.StructType] =
        None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val pairs = entries.map { case (f, newSc, oldSc) =>
      (scanPath(root, f),
        resolvePath(root, newSc).getAbsolutePath,
        if (oldSc.isEmpty) ""
        else resolvePath(root, oldSc).getAbsolutePath)
    }
    val delta = spark.createDataset(pairs)
      .flatMap { case (dataPath, newSc, oldSc) =>
        val fresh = decodeDv(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(newSc)))
        val old: Set[Long] =
          if (oldSc.isEmpty) Set.empty
          else decodeDv(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(oldSc))).toSet
        fresh.iterator.filterNot(old).map(i => (dataPath, i))
      }.toDF("__dv_f", "__dv_idx")
    val scan = ManifestFileIndex.read(spark, root,
      entries.map(e => entryFor(root, e._1, Map.empty)),
      declaredSchema = declaredSchema)
    scan
      .join(broadcast(delta),
        col("_metadata.file_path") === col("__dv_f") &&
          col("_metadata.row_index") === col("__dv_idx"),
        "left_semi")
  }

  /** ROW-LEVEL CHANGE FEED with `_change_type` images (r15 verdict #4)
    * — the missing half of [[readChanges]], correct for REWRITING
    * commits too: for each version v in (`from`, `to`], the rows of
    * v's REMOVED files (the pre state the commit retired) full-outer
    * join the rows of its ADDED files on `keys`, and every key
    * classifies as exactly one of
    *
    *   - `insert`           (post image; key absent from the removed rows)
    *   - `delete`           (pre image; key absent from the added rows)
    *   - `update_preimage` + `update_postimage` (both images; payload
    *                         differs between the sides)
    *
    * while rows CARRIED unchanged through the rewrite produce nothing —
    * the per-row change-data-feed consumers need (Delta's CDF
    * `_change_type` column) reconstructed from the log's file-level
    * actions, no stored change files required.
    *
    * Why this is log-driven, not snapshot-driven: only the files the
    * commit TOUCHED are read (a commit rewriting 2 of 80,000 files
    * reads 4 files, never two table snapshots), the join shuffles only
    * those rows once per version, and rows in untouched files appear
    * on neither side — which is exactly the "unchanged" answer. For an
    * append-only commit (no removes) the join degenerates to a
    * zero-shuffle all-inserts scan; a delete-only commit to
    * all-deletes. Null-safe key equality keeps null keys paired.
    *
    * Output: `keys` ++ payload columns (from the image side) ++
    * `_change_type` ++ `_commit_version`. Requires every manifest in
    * the range (same loud pruned-tail contract as [[changesBetween]]).
    * `keys` must identify a row within a version for the images to be
    * row-accurate (the same requirement Delta's MERGE puts on its
    * match condition).
    *
    * PLAN SIZE: one logical branch per version in the range — callers
    * syncing an UNBOUNDED lag must window the range (the streaming
    * bridge bounds it with maxVersionsPerTrigger; [[replicateTo]]
    * with maxVersionsPerSync, r19); at a 10k-version lag the driver's
    * plan analysis alone would dominate. */
  def readChangeImages(spark: SparkSession, root: String, from: Long,
      to: Long, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "change images need at least one key column")
    val store = storeFor(root)
    // SCHEMA-EVOLVED ranges (r17): a range spanning an additive
    // evolution mixes file generations — every frame must plan under
    // the `to` snapshot's DECLARED schema (pre-evolution rows surface
    // NULL for the new columns, exactly as the snapshot read does),
    // or the per-version unions and the pre/post join mis-shape.
    // Tables that never declared have one physical schema by
    // construction and read from footers as before.
    val declared = replayIn(store, to).schemaDdl
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    // The DV baseline: pre-images must exclude rows that were ALREADY
    // dead before the range (a compaction would otherwise re-emit
    // every earlier MOR delete as a fresh one), so the walk threads
    // the vector state from `from` forward. A negative `from` starts
    // before the table existed (empty state); otherwise `from` must
    // be resolvable — without its state the feed cannot know which
    // removed rows were alive (loud, like every pruned-tail read).
    var dvState: Map[String, DvRef] =
      if (from >= 0 && (versionsIn(store).contains(from) ||
          checkpointVersionsIn(store).contains(from)))
        replayIn(store, from).dvs
      else if (from < 0) Map.empty
      else {
        // unresolvable baseline: exact ONLY for a table that has
        // never used vectors. Any DV state that outlived retention is
        // folded into a surviving checkpoint (the policy checkpoints
        // before it prunes), so "no dv field anywhere in surviving
        // metadata" proves the empty baseline — otherwise loud.
        // FAST PATH (r19; r18 verdict next-8 #7): the latest
        // checkpoint's folded dvs-ever bit covers all history ≤ it —
        // O(tail) instead of O(versions). The probe is SHARED with
        // [[dvsEverThrough]] (r20; r19 advice): the duplicate scan
        // this replaced consulted only the checkpoints' inline "dvs"
        // fields on the no-bit path, so an earlier pq checkpoint whose
        // dv refs ride the parquet sidecar could be the only surviving
        // DV evidence and the feed would silently serve an empty DV
        // baseline; dvsEverThrough's fallback checks earlier
        // checkpoints' dvsever bits too.
        val dvVisible = dvsEverThrough(store, Long.MaxValue)
        require(!dvVisible,
          s"change-image baseline $from not resolvable and the log " +
            "carries deletion vectors — pre-images cannot be " +
            "classified; re-bootstrap from a snapshot")
        Map.empty
      }
    val perVersion = changesBetween(root, from, to).flatMap {
      case (v, adds, removes) =>
        val dvEntries = parseDvs(field(
          store.read(manifestName(v)), "dvs"))
        // pre side, two sources: rows of the files this commit
        // RETIRED (minus their already-dead rows), and rows this
        // commit's new VECTORS killed in files that stay live
        val removeSet = removes.toSet
        val preRemoved =
          if (removes.isEmpty) None
          else Some(readFilesIndexed(spark, root, removes,
            dvs = dvState.filter { case (f, _) => removeSet(f) },
            declaredSchema = declared))
        val preDelta =
          if (dvEntries.isEmpty) None
          else Some(readDvDeltaRows(spark, root,
            dvEntries.toSeq.sortBy(_._1).map { case (f, ref) =>
              (f, ref.sidecar,
                dvState.get(f).map(_.sidecar).getOrElse("")) },
            declaredSchema = declared))
        dvState = (dvState -- removes) ++ dvEntries
        // post side: rows of the files this commit ADDED, minus any
        // vector the same commit put on them
        val post =
          if (adds.isEmpty) None
          else Some(readFilesIndexed(spark, root, adds,
            dvs = { val addSet = adds.toSet
              dvState.filter { case (f, _) => addSet(f) } },
            declaredSchema = declared))
        val pre = (preRemoved, preDelta) match {
          case (Some(a), Some(b)) => Some(a.unionByName(b))
          case (a, b) => a.orElse(b)
        }
        if (pre.isEmpty && post.isEmpty) None
        else Some((v, pre, post))
    }.map { case (v, pre, post) =>
        val payload = (post.orElse(pre)).get.columns.filterNot(keys.contains)
        def img(df: DataFrame, tpe: String) = df.select(
          (keys.map(col) :+
            struct(payload.map(col): _*).as("__img") :+
            lit(tpe).as("_change_type")): _*)
        val images = (pre, post) match {
          case (None, Some(p)) => img(p, "insert") // append-only commit
          case (Some(p), None) => img(p, "delete") // delete-only commit
          case (Some(preDf), Some(postDf)) =>
            val o = img(preDf, "o").withColumnRenamed("__img", "__pre")
              .drop("_change_type").alias("o")
            val n = img(postDf, "n").withColumnRenamed("__img", "__post")
              .drop("_change_type").alias("n")
            val cond = keys.map(k => col(s"o.$k") <=> col(s"n.$k"))
              .reduce(_ && _)
            n.join(o, cond, "full_outer")
              // carried-unchanged rows (both sides, equal payload)
              // drop here — before the explode doubles anything
              .filter(col("o.__pre").isNull || col("n.__post").isNull ||
                col("o.__pre") =!= col("n.__post"))
              .select(
                (keys.map(k =>
                  coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) :+
                  explode(
                    when(col("o.__pre").isNull, array(
                      struct(lit("insert").as("_change_type"),
                        col("n.__post").as("__img"))))
                    .when(col("n.__post").isNull, array(
                      struct(lit("delete").as("_change_type"),
                        col("o.__pre").as("__img"))))
                    .otherwise(array(
                      struct(lit("update_preimage").as("_change_type"),
                        col("o.__pre").as("__img")),
                      struct(lit("update_postimage").as("_change_type"),
                        col("n.__post").as("__img"))))).as("__i")): _*)
              .select((keys.map(col) :+ col("__i.__img").as("__img") :+
                col("__i._change_type").as("_change_type")): _*)
          case (None, None) => throw new IllegalStateException("unreachable")
        }
        images.withColumn("_commit_version", lit(v))
    }
    if (perVersion.isEmpty) {
      // METADATA-ONLY range (r17 advice): every version in (from, to]
      // declared schema/checks, carried txn markers, or was otherwise
      // fileless — a VALID, EMPTY feed, so consumers (the replica's
      // sync loop, a streaming bridge) advance their cursor instead
      // of crashing until a data commit lands. The frame still needs
      // the table's exact image schema; shape it from one live file
      // of the `to` snapshot at zero row cost (limit 0 plans nothing).
      val live = filesAsOfIn(store, to)
      require(live.nonEmpty,
        s"no file actions in ($from, $to] and no live files at $to — " +
          "cannot shape an empty change-image frame")
      val base = readFilesIndexed(spark, root, live.take(1),
        declaredSchema = declared).limit(0)
      val payload = base.columns.filterNot(keys.contains)
      return base.select((keys.map(col) ++ payload.map(col) :+
        lit("").as("_change_type") :+
        lit(0L).as("_commit_version")): _*)
    }
    perVersion.reduce(_.unionByName(_))
      .select((keys.map(col) ++
        perVersion.head.select(col("__img.*")).columns.map(c =>
          col(s"__img.$c").as(c)) ++
        Seq(col("_change_type"), col("_commit_version"))): _*)
  }

  /** Live per-file NULL-count stats as of `version` (r18). */
  def nullStatsAsOf(root: String,
      version: Long): Map[String, Map[String, NullStat]] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).nullStats
  }

  /** Live per-file STRING column bounds as of `version` (r17). */
  def strColStatsAsOf(root: String,
      version: Long): Map[String, Map[String, StrStat]] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).strColStats
  }

  /** The CHECK-constraint set in force at `version` (name → SQL
    * boolean expression over the table's columns). */
  /** The DECLARED schema DDL in force as of `version` (None for
    * tables that never declared — single physical generation by
    * construction). Same resolution rules as [[filesAsOfIn]]. */
  def schemaDdlAsOf(root: String, version: Long): Option[String] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).schemaDdl
  }

  /** The in-force declared-schema DDL for EVERY version in
    * (`from`, `to`], computed with ONE replay at `from` plus one
    * manifest read per version (the streaming gate previously
    * replayed per version — O(V^2); review finding, r17). `from < 0`
    * seeds from nothing. */
  private[sources] def schemaDdlsThroughIn(store: LogStore, from: Long,
      to: Long): Map[Long, Option[String]] = {
    var cur: Option[String] =
      if (from >= 0 && (versionsIn(store).contains(from) ||
          checkpointVersionsIn(store).contains(from)))
        replayIn(store, from).schemaDdl
      else None
    ((from + 1) to to).map { v =>
      decodeSchemaField(field(store.read(manifestName(v)), "schema"))
        .foreach(d => cur = Some(d))
      v -> cur
    }.toMap
  }

  def schemaDdlsThrough(root: String, from: Long,
      to: Long): Map[Long, Option[String]] =
    schemaDdlsThroughIn(storeFor(root), from, to)

  def checksAsOf(root: String, version: Long): Map[String, String] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    replayIn(store, version).checks
  }

  /** INVARIANT ENFORCEMENT at the write boundary (Delta's CHECK
    * constraints): one aggregate pass over the batch counts every
    * constraint's violations TOGETHER (SQL CHECK semantics — NULL
    * passes, only FALSE violates), and any violation aborts loudly
    * BEFORE anything lands or commits, naming each failed constraint
    * and its row count. Cost is one scan of the batch regardless of
    * how many constraints the table declares; the decision of WHICH
    * constraints apply is manifest metadata ([[checksAsOf]]). */
  def requireSatisfies(df: DataFrame,
      checks: Map[String, String]): Unit = {
    if (checks.isEmpty) return
    import org.apache.spark.sql.functions._
    val names = checks.keys.toSeq.sorted
    val aggs = names.map(n => count(
      when(!coalesce(expr(checks(n)), lit(true)), lit(1))).as(n))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bad = names.map(n => n -> row.getAs[Long](n))
      .collect { case (n, v) if v > 0 =>
        s"$n [${checks(n)}] ($v rows)" }
    require(bad.isEmpty,
      s"CHECK constraint(s) violated: ${bad.mkString("; ")} — " +
        "nothing was committed")
  }

  /** THE GUARDED APPEND (r16, one-pass since r17) — the one-call
    * ingest path composing every write-side seam this log ships:
    *
    *   1. validate the batch against the CHECK constraints in force
    *      at the snapshot — IN THE WRITE LOOP ITSELF: each constraint
    *      compiles to a boolean violation column the single-pass
    *      writer counts per file alongside its stats fold, so the
    *      batch is evaluated exactly ONCE (r17 advice: a separate
    *      validation scan of a non-deterministic input — limit /
    *      sample / unstable shuffle — could pass the gate and then
    *      land different, violating rows; one pass makes the rows
    *      validated and the rows landed the SAME rows by
    *      construction);
    *   2. on any violation, unlink the landed files + sidecars and
    *      abort loudly naming each failed constraint and its row
    *      count — nothing was committed, the orphans are gone;
    *   3. publish through the SERIALIZABLE protocol, attested (the
    *      rows were row-validated, so stats-unprovable constraints
    *      pass the commit-time gate); a winner that DECLARED a new
    *      constraint set mid-flight raises [[LogicalConflict]] —
    *      the validation premise is stale, the caller re-runs.
    *
    * Returns the committed version. This is the method an ingest job
    * calls instead of hand-sequencing the seams (the
    * `lake_check_constraint` builder is the hand-sequenced form, kept
    * as documentation of what this composes). */
  def appendChecked(spark: SparkSession, df: DataFrame, root: String,
      sub: String, statsCols: Seq[String] = Seq.empty,
      bloomCol: Option[String] = None,
      policy: Option[CheckpointPolicy] = None,
      commitMs: Option[Long] = None): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val read = latestVersion(root)
    val checks = read.map(checksAsOf(root, _)).getOrElse(Map.empty)
    val names = checks.keys.toSeq.sorted
    val violCols = names.indices.map(i => s"__graft_viol_$i")
    val guarded = names.zip(violCols).foldLeft(df) { case (d, (n, c)) =>
      // SQL CHECK semantics: NULL passes, only FALSE violates
      d.withColumn(c, not(coalesce(expr(checks(n)), lit(true))))
    }
    val summaries = SinglePassWriter.writeFiles(guarded, root, sub,
      statsCols, bloomCol, checkCols = violCols)
    val bad = names.zipWithIndex.collect {
      case (n, i) if summaries.iterator.map(_.viols(i)).sum > 0 =>
        s"$n [${checks(n)}] (${summaries.iterator.map(_.viols(i)).sum} rows)"
    }
    if (bad.nonEmpty) summaries.foreach { s =>
      Files.deleteIfExists(Paths.get(root, s.rel))
      Files.deleteIfExists(Paths.get(root, s"${s.rel}.bloom"))
    }
    require(bad.isEmpty,
      s"CHECK constraint(s) violated: ${bad.mkString("; ")} — " +
        "nothing was committed")
    require(summaries.nonEmpty, "guarded append landed no files")
    commitSerializable(root, read.getOrElse(-1L),
      adds = summaries.map(_.rel), removes = Seq.empty, op = "append",
      policy = policy, commitMs = commitMs,
      colStats = SinglePassWriter.colStatsOf(summaries, statsCols),
      blooms = SinglePassWriter.bloomsOf(summaries, bloomCol),
      nullStats = SinglePassWriter.nullStatsOf(summaries, statsCols),
      attest = true)
  }

  /** SHALLOW CLONE (r17) — a new, independently writable table whose
    * v0 references the SOURCE snapshot's data files BY ABSOLUTE PATH
    * (Delta's shallow clone / Iceberg's snapshot-ref pattern): one
    * metadata-sized commit, ZERO data IO, at any table size. The
    * clone's v0 carries everything the source snapshot knew —
    * per-file stats, string bounds, bloom refs, deletion vectors
    * (sidecars by absolute ref too), the declared schema and the
    * CHECK constraint set — so reads prune and MOR-filter exactly as
    * the source does, and the commit-time constraint gate governs
    * the clone's own future ingest from the first append.
    *
    * DIVERGENCE is clone-local by construction: appends and rewrites
    * land under the clone's root; a MOR delete writes its vector
    * under the clone's `ext/` (never beside the source's bytes);
    * removes just drop the absolute reference. The source's log and
    * bytes are never written — and the clone's VACUUM can never
    * reclaim them (its sweep only walks the clone's root).
    *
    * CONTRACT (the same one Delta documents): the clone depends on
    * the source's referenced bytes staying alive — a VACUUM on the
    * source that reclaims a still-referenced file breaks the clone
    * loudly at read time. A clone of a clone resolves (absolute refs
    * pass through verbatim). Returns the committed absolute
    * references. */
  def cloneShallow(srcRoot: String, dstRoot: String, version: Long,
      policy: Option[CheckpointPolicy] = None,
      commitMs: Option[Long] = None,
      txn: Option[(String, Long)] = None): Seq[String] = {
    val srcStore = storeFor(srcRoot)
    require(versionsIn(srcStore).contains(version) ||
      checkpointVersionsIn(srcStore).contains(version),
      s"clone source version $version not in manifest log")
    val dstStore = storeFor(dstRoot)
    require(versionsIn(dstStore).isEmpty &&
      checkpointVersionsIn(dstStore).isEmpty,
      s"clone destination $dstRoot already has a log — clone only " +
        "seeds NEW tables")
    val r = replayIn(srcStore, version)
    require(r.files.nonEmpty,
      s"clone source version $version resolves to no files")
    val abs = r.files.map(f =>
      f -> resolvePath(srcRoot, f).getAbsolutePath).toMap
    def absSc(sc: String) = resolvePath(srcRoot, sc).getAbsolutePath
    commitIn(dstStore, 0, adds = r.files.map(abs), removes = Seq.empty,
      op = "clone", policy = policy,
      stats = r.stats.collect {
        case (f, st) if abs.contains(f) => abs(f) -> st },
      colStats = r.colStats.collect {
        case (f, cs) if abs.contains(f) => abs(f) -> cs },
      blooms = r.blooms.collect {
        case (f, bs) if abs.contains(f) => abs(f) -> bs.map {
          case (c, ref) => c -> ref.copy(sidecar = absSc(ref.sidecar)) } },
      txn = txn,
      dvs = r.dvs.collect { case (f, d) if abs.contains(f) =>
        abs(f) -> d.copy(sidecar = absSc(d.sidecar)) },
      commitMs = commitMs, schemaDdl = r.schemaDdl,
      checks = if (r.checks.nonEmpty) Some(r.checks.toSeq.sortBy(_._1))
        else None,
      strColStats = r.strColStats.collect {
        case (f, cs) if abs.contains(f) => abs(f) -> cs },
      nullStats = r.nullStats.collect {
        case (f, ns) if abs.contains(f) => abs(f) -> ns })
    r.files.map(abs)
  }

  /** Hive `k=v` partition segments of ABSOLUTE references, resolved
    * against the refs' shared directory ancestry (r18; r17 advice —
    * the old whole-path split falsely refused materialization when
    * any ANCESTOR of the source root contained '=', e.g. a temp dir
    * named `run=3`): an absolute ref's path includes the source
    * table's own ancestors, which are NOT layout. The partition
    * layout is the '='-segments BELOW the refs' longest common
    * directory prefix, with any TRAILING '='-segments of that prefix
    * pushed back into the layout (a partition column with a single
    * live value is common to every path but is still layout). File
    * names are never segments. Relative refs resolve against the
    * table's own root — their whole directory path is layout.
    *
    * DOCUMENTED AMBIGUITY (r19; r18 advice): a single-valued LEADING
    * '='-segment is indistinguishable, from paths alone, from an
    * '='-named directory sitting immediately above the layout (a
    * clone of one partition directory `.../dt=2026-08-16/hour=*`
    * reads the same as a source ROOT named `dt=2026-08-16` holding an
    * hour-partitioned table). This parse resolves it AS LAYOUT — the
    * view [[readVersionHive]] has always given, self-consistent
    * across reads and pinned by ManifestLogSpec — and
    * [[materializeExternal]] bakes the same column in permanently.
    * Callers cloning FROM a path whose directories contain '=' must
    * either rename the source path or materialize explicitly
    * (readVersionHive + a hand partitionBy rewrite); the all-pushed-
    * back case, where NO below-prefix segment corroborates a layout,
    * stays a loud refusal in materializeExternal. */
  private[sources] def hiveSegsOf(files: Seq[String])
      : Map[String, Seq[(String, String)]] = {
    def kv(s: String) = {
      val i = s.indexOf('='); (s.substring(0, i), s.substring(i + 1))
    }
    val (abs, rel) = files.partition(_.startsWith("/"))
    val relMap = rel.map(f => f ->
      f.split('/').toSeq.init.filter(_.contains('=')).map(kv)).toMap
    val absMap =
      if (abs.isEmpty) Map.empty[String, Seq[(String, String)]]
      else {
        val dirs = abs.map(_.split('/').toSeq.init)
        val shortest = dirs.map(_.size).min
        var p = 0
        while (p < shortest && dirs.forall(_(p) == dirs.head(p))) p += 1
        while (p > 0 && dirs.head(p - 1).contains('=')) p -= 1
        abs.zip(dirs).map { case (f, d) =>
          f -> d.drop(p).filter(_.contains('=')).map(kv)
        }.toMap
      }
    relMap ++ absMap
  }

  /** MATERIALIZE a shallow clone (r17) — the escape hatch that ENDS
    * the clone contract's source dependency (Delta documents the
    * same "deep-copy later" path): every ABSOLUTE-referenced file
    * rewrites into table-owned local files — MOR-FILTERED, so any
    * inherited deletion vector folds into the rewrite and its ref
    * drops — and one commit swaps references for locals. Local files
    * and their metadata are untouched; after this, a vacuum on the
    * SOURCE can no longer break this table. `statsCols` /
    * `strStatsCols` re-commit skipping metadata from the rewrite
    * pass itself (zero extra IO, the compaction convention);
    * `clusterBy` range-clusters the rewrite so those stats can
    * prune. A table with no external references is a NO-OP (no
    * commit). Returns the new local files.
    *
    * HIVE-LAYOUT references (r18; closes the r17 loud refusal): refs
    * whose partition values live only in `k=v` path segments
    * materialize through a partitionBy rewrite into the clone's OWN
    * hive layout — partition values re-derived from the paths (below
    * the refs' shared ancestry, so an '=' in an ancestor directory
    * of the SOURCE root is never mistaken for layout — r17 advice)
    * and re-written as the new files' own segments, byte-identical
    * under [[readVersionHive]] after the source is gone. The hive
    * rewrite commits no column stats (partition pruning is the
    * layout's index); `statsCols`/`clusterBy` apply to the flat
    * path only. */
  def materializeExternal(spark: SparkSession, root: String,
      statsCols: Seq[String] = Seq.empty,
      strStatsCols: Seq[String] = Seq.empty,
      clusterBy: Seq[String] = Seq.empty, files: Int = 0,
      policy: Option[CheckpointPolicy] = None): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val store = storeFor(root)
    val latest = (versionsIn(store) ++ checkpointVersionsIn(store))
      .maxOption.getOrElse(throw new IllegalArgumentException(
        s"empty log at $root — nothing to materialize"))
    val r = replayIn(store, latest)
    val ext = r.files.filter(_.startsWith("/"))
    if (ext.isEmpty) return Seq.empty
    // hive-layout references carry partition VALUES only in their
    // k=v path segments — a flat rewrite would silently drop them
    // (review finding, r17), so they take the partitionBy rewrite
    // path instead (r18); detection looks only BELOW the refs'
    // shared ancestry, so an '=' in an ancestor directory of the
    // source root never misroutes a flat clone (r17 advice)
    val extSegs = hiveSegsOf(ext)
    if (extSegs.valuesIterator.exists(_.nonEmpty)) {
      // AMBIGUITY guard (review finding, r18): when every detected
      // segment came from the trailing-'=' push-back — i.e. no ref
      // carries an '='-segment BELOW the refs' raw common prefix —
      // the layout is indistinguishable from a source whose own ROOT
      // directory merely contains '=' (files directly beneath it).
      // Rewriting would invent a phantom partition column silently;
      // refuse loudly instead (a genuine single-valued partition
      // layout hits this too — materialize it via an explicit
      // readVersionHive + partitionBy rewrite, stated in the error).
      val dirs = ext.map(_.split('/').toSeq.init)
      val shortest = dirs.map(_.size).min
      var p = 0
      while (p < shortest && dirs.forall(_(p) == dirs.head(p))) p += 1
      val belowRawPrefix = dirs.exists(_.drop(p).exists(_.contains('=')))
      require(belowRawPrefix,
        "external references carry '='-segments only in their SHARED " +
          "ancestry — indistinguishable between a single-valued hive " +
          "partition and a source root whose directory name contains " +
          "'='; materialize explicitly (readVersionHive + partitionBy " +
          "rewrite) or re-clone from a source path without '='")
      return materializeExternalHive(spark, root, latest, r, ext,
        extSegs, files, policy)
    }
    val live = readFilesIndexed(spark, root, ext, r.colStats,
      r.dvs.filter { case (f, _) => ext.contains(f) },
      declaredSchema = r.schemaDdl.map(
        org.apache.spark.sql.types.StructType.fromDDL))
    val n = if (files > 0) files
      else math.max(8, spark.sparkContext.defaultParallelism)
    val df =
      if (clusterBy.nonEmpty)
        live.repartitionByRange(n, clusterBy.map(col): _*)
      else live.repartition(n)
    val sub = s"data/mz${latest + 1}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val summaries = SinglePassWriter.writeFiles(df, root, sub,
      statsCols, strStatsCols = strStatsCols)
    // attested: a materialization is content-preserving by
    // construction — every row was already committed and validated
    // upstream (the same exemption pure-layout rewrites get)
    commit(root, latest + 1, adds = summaries.map(_.rel),
      removes = ext, op = "materialize", policy = policy,
      colStats = SinglePassWriter.colStatsOf(summaries, statsCols),
      strColStats =
        SinglePassWriter.strColStatsOf(summaries, strStatsCols),
      nullStats =
        SinglePassWriter.nullStatsOf(summaries, statsCols, strStatsCols),
      attest = true)
    summaries.map(_.rel)
  }

  /** The hive half of [[materializeExternal]] (r18; spec-evolved
    * layouts r19): rewrite the hive-layout external references into
    * the table's OWN `k=v` layout — partition values re-derived from
    * the committed paths (keyed by scan-reported file identity, never
    * by re-parsing paths inside the index, whose per-entry parse
    * would see the source's ancestors on absolute refs),
    * MOR-filtered, planned under the declared schema, re-written with
    * `partitionBy` so the new files' own segments carry the values.
    *
    * PARTITION-SPEC-EVOLVED (prefix) layouts (r19; the r18 verdict's
    * task 5 — previously a loud refusal): the GENERATIONS — distinct
    * segment-name lists — are distinguishable from the committed
    * paths, so each generation rewrites through its OWN partitionBy
    * column set (the zero-segment generation, files from before the
    * first spec addition, rewrites flat) and every file's original
    * segment list survives verbatim — no absent value ever meets the
    * default-partition sentinel. The [[readVersionHive]] PREFIX rule
    * is enforced up front: a genuinely mixed (non-prefix) layout has
    * no hive read to be byte-identical to and stays loud. The type
    * rule is GLOBAL per column, exactly readVersionHive's view, so
    * the materialized table reads type-identically to the clone. */
  private def materializeExternalHive(spark: SparkSession, root: String,
      latest: Long, r: Replay, ext: Seq[String],
      extSegs: Map[String, Seq[(String, String)]], files: Int,
      policy: Option[CheckpointPolicy]): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val fullest = ext.map(f => extSegs(f).map(_._1)).maxBy(_.size)
    require(ext.forall(f => fullest.startsWith(extSegs(f).map(_._1))),
      "hive-layout materialization needs every external reference's " +
        "partition segments to be a PREFIX of the fullest layout " +
        s"$fullest — the shape partition-spec addition produces; a " +
        "mixed (non-additive) layout is not resolvable by " +
        "readVersionHive; read and rewrite by hand")
    val segMaps: Map[String, Map[String, String]] =
      ext.map(f => f -> extSegs(f).toMap).toMap
    val longTyped = fullest.map { n =>
      val vals = ext.flatMap(f => segMaps(f).get(n))
      n -> vals.forall(v => scala.util.Try(v.toLong).isSuccess)
    }.toMap
    val declared = r.schemaDdl.map(StructType.fromDDL)
    val nFlat = if (files > 0) files
      else math.max(8, spark.sparkContext.defaultParallelism)
    val sub = s"data/mz${latest + 1}-" +
      java.util.UUID.randomUUID().toString.take(8)
    // prefix rule → generations have pairwise-distinct sizes, so the
    // per-generation sub dir is collision-free by construction
    val generations = ext.groupBy(f => extSegs(f).map(_._1)).toSeq
      .sortBy(_._1.size)
    val adds = generations.flatMap { case (names, gFiles) =>
      val live = readFilesIndexed(spark, root, gFiles, r.colStats,
        r.dvs.filter { case (f, _) => gFiles.contains(f) },
        declaredSchema = declared)
      val gSub = s"$sub/g${names.size}"
      if (names.isEmpty) {
        // the pre-partitioning generation: flat files stay flat
        live.repartition(nFlat)
          .write.parquet(new java.io.File(root, gSub).getAbsolutePath)
      } else {
        val pvRows: Seq[org.apache.spark.sql.Row] = gFiles.map { f =>
          org.apache.spark.sql.Row.fromSeq(
            scanPath(root, f) +: names.map(n => segMaps(f)(n)))
        }
        val pvSchema = StructType(
          StructField("__mz_f", StringType, nullable = false) +:
            names.map(n => StructField(n, StringType, nullable = false)))
        val pv = names.foldLeft(spark.createDataFrame(
            spark.sparkContext.parallelize(pvRows, 1), pvSchema)) {
          (d, n) =>
            if (longTyped(n)) d.withColumn(n, col(n).cast(LongType))
            else d
        }
        val withParts = live
          .withColumn("__mz_f", col("_metadata.file_path"))
          .join(broadcast(pv), "__mz_f").drop("__mz_f")
        // one task per partition directory (hash on the partition
        // cols) — `files` overrides for skewed layouts
        val df =
          if (files > 0) withParts.repartition(files, names.map(col): _*)
          else withParts.repartition(names.map(col): _*)
        df.write.partitionBy(names: _*)
          .parquet(new java.io.File(root, gSub).getAbsolutePath)
      }
      partFilesRecursive(root, gSub)
    }
    require(adds.nonEmpty, "hive materialization landed no files")
    // attested: content-preserving by construction, like the flat path
    commit(root, latest + 1, adds = adds, removes = ext,
      op = "materialize", policy = policy, attest = true)
    adds
  }

  /** CDC REPLICATION (r16) — maintain a MIRROR table from the source
    * log's change-image feed: the canonical downstream consumer of
    * [[readChangeImages]] (Delta CDF's flagship use). One sync:
    *
    *   1. resume cursor = the mirror log's txn marker for this
    *      source (exactly-once survives total loss of any consumer
    *      state — the idempotence decision lives in the MIRROR's own
    *      log, like the streaming sink's);
    *   2. read the images in (cursor, upTo], keep each key's LATEST
    *      non-pre image (per version a key has at most one — insert /
    *      update_postimage / delete — so version order decides);
    *   3. fold: changed keys leave the current mirror state, the
    *      surviving post-images re-enter, and the new state commits
    *      with the txn marker in ONE atomic manifest.
    *
    * The mirror is correct for EVERY source mutation class — appends,
    * COW rewrites, MOR deletes/merges, compactions (zero images) —
    * because the feed already normalized them to row images.
    *
    * THE FOLD IS KEY-PRUNED (r17; closes the r16 verdict's one weak):
    * the sync's changed-key set — delta-sized by definition — prunes
    * the mirror's files through [[filesMatchingKeysIn]] (range stats
    * + blooms per file), and ONLY files that can hold a changed key
    * are rewritten; every other file is carried by reference, exactly
    * as `lake_merge_cow` carries its untouched files. Mirror files
    * are landed through the single-pass writer clustered on the lead
    * key, so each sync re-commits the stats the NEXT sync prunes by.
    * Per-sync cost is O(images + intersecting files), never
    * O(mirror) — at 100 TB a trickle sync rewrites KBs, not the
    * table. STRING lead keys prune too (UTF-8-ordered bounds via
    * [[filesMatchingStrKeysIn]], r17); only a non-integral,
    * non-string key falls back to the full fold.
    *
    * CONCURRENCY (r17 advice): each attempt derives the fold from
    * the mirror's FRESH latest version and publishes through
    * [[commitSerializable]] with the rewritten files as its read
    * set, so a foreign commit that raced in is never clobbered — a
    * disjoint winner costs a metadata rebase, an overlapping one
    * ([[LogicalConflict]]) re-derives the fold, and a same-appId
    * winner is caught by the marker re-check. Returns the source
    * version now mirrored.
    *
    * BOOTSTRAP (r17): the FIRST sync of an empty mirror is corpus-
    * sized by definition under the feed fold (every source row
    * arrives as an insert image and is rewritten through the mirror
    * writer — the ~26 s-at-100× cost the r17 rungs recorded).
    * `bootstrap = "clone"` replaces that first sync with a SHALLOW
    * CLONE of the source snapshot ([[cloneShallow]] + the txn
    * marker, one metadata-sized commit, zero data IO) and pays the
    * image feed only for the tail — the production follower shape
    * (Delta's documented CLONE-then-CDF pattern). Later syncs then
    * LOCALIZE the mirror lazily: a touched by-reference file is
    * rewritten into mirror-owned, key-clustered, stats-bearing local
    * files; untouched references carry. Requires the source log's
    * root to stay reachable from the mirror's readers (the clone
    * contract); the default `"feed"` keeps the physically
    * independent bootstrap. */
  /** Is the replica sync's full key-TUPLE set provably within the
    * driver bound? Single-key syncs inherit the lead-key bound (the
    * sets are identical); multi-key syncs count the distinct tuple
    * frame through a limit, so the job's work is capped at maxKeys+1
    * rows regardless of the true cardinality. Seam for the broadcast
    * hint decision (r19), pinned by ManifestReplicaSpec. */
  private[sources] def replicaTupleBounded(changedKeys: DataFrame,
      nKeys: Int, maxKeys: Int): Boolean =
    nKeys == 1 ||
      changedKeys.distinct().limit(maxKeys + 1).count() <= maxKeys

  def replicateTo(spark: SparkSession, srcRoot: String, dstRoot: String,
      keys: Seq[String], upTo: Option[Long] = None,
      appId: String = "graft_replica", mirrorFiles: Int = 0,
      maxAttempts: Int = 5, bootstrap: String = "feed",
      maxKeys: Int = 100000,
      maxVersionsPerSync: Option[Long] = None): Long = {
    require(bootstrap == "feed" || bootstrap == "clone",
      s"bootstrap must be 'feed' or 'clone', got '$bootstrap'")
    require(maxVersionsPerSync.forall(_ > 0),
      "maxVersionsPerSync must be positive")
    if (bootstrap == "clone" && latestVersion(dstRoot).isEmpty &&
        lastTxn(dstRoot, appId).isEmpty) {
      val bootTo = upTo.getOrElse(latestVersion(srcRoot).getOrElse(
        throw new IllegalArgumentException(
          s"empty source log: $srcRoot")))
      cloneShallow(srcRoot, dstRoot, bootTo,
        txn = Some((appId, bootTo)))
      return bootTo
    }
    val srcLatest = latestVersion(srcRoot).getOrElse(
      throw new IllegalArgumentException(s"empty source log: $srcRoot"))
    val to = upTo.getOrElse(srcLatest)
    val applied = lastTxn(dstRoot, appId).getOrElse(-1L)
    if (applied >= to) return applied // replay: already mirrored
    // CHUNKED SYNC (r19; r18 verdict watch-item 2): readChangeImages
    // builds one plan branch per version in the range, so a batch
    // sync whose cursor lags K commits unions K per-version subplans
    // — at a 10k-version lag the DRIVER's plan analysis alone is the
    // bottleneck. maxVersionsPerSync mirrors the streaming source's
    // maxVersionsPerTrigger: the sync loops bounded image-feed
    // windows, each committed ATOMICALLY with its own txn marker, so
    // the plan never carries more than the bound's branches and a
    // crash mid-loop resumes at the last completed window for free
    // (the next call's marker re-check skips it). Window order is
    // version order, and each window folds its keys' latest images,
    // so the final mirror state is exactly the one-shot sync's — the
    // same trickle-sync sequence the registered rows already prove.
    maxVersionsPerSync match {
      case Some(m) if to - applied > m =>
        var cur = applied
        while (cur < to)
          cur = replicateWindow(spark, srcRoot, dstRoot, keys,
            math.min(cur + m, to), appId, mirrorFiles, maxAttempts,
            maxKeys)
        cur
      case _ =>
        replicateWindow(spark, srcRoot, dstRoot, keys, to, appId,
          mirrorFiles, maxAttempts, maxKeys)
    }
  }

  /** One atomic sync window of [[replicateTo]]: mirror everything up
    * to source version `to`, commit with the txn marker (appId, to).
    * A marker already >= `to` is a completed replay — no-op. */
  private def replicateWindow(spark: SparkSession, srcRoot: String,
      dstRoot: String, keys: Seq[String], to: Long, appId: String,
      mirrorFiles: Int, maxAttempts: Int, maxKeys: Int): Long = {
    // mirrorFiles <= 0 = auto: at least the cluster's parallelism, so
    // a corpus-sized BOOTSTRAP sync writes with every core (8 files
    // was a serialization chokepoint at the 100x rung) while trickle
    // syncs still land small clustered files
    val nMirrorFiles =
      if (mirrorFiles > 0) mirrorFiles
      else math.max(8, spark.sparkContext.defaultParallelism)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val applied = lastTxn(dstRoot, appId).getOrElse(-1L)
    if (applied >= to) return applied // replay: already mirrored
    val images = readChangeImages(spark, srcRoot, applied, to, keys)
    val ranked = images
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("_commit_version").desc)))
      .filter(col("__rk") === 1).drop("__rk")
    val upserts = ranked.filter(col("_change_type") =!= "delete")
      .drop("_change_type", "_commit_version")
    val changedKeys = ranked.select(keys.map(col): _*)
    // the prune key: the LEAD key column (a file that cannot hold any
    // changed lead-key value cannot hold any changed full key —
    // pruning on a key prefix is conservative-correct). Integral keys
    // prune by [min, max] long stats + blooms; STRING keys (r17) by
    // UTF-8-ordered string bounds.
    val keyCol = keys.head
    val integralKey = images.schema(keyCol).dataType match {
      case LongType | IntegerType | TimestampType | DateType => true
      case _ => false
    }
    val stringKey = images.schema(keyCol).dataType == StringType
    // the changed-key collect is BOUNDED (r18; closes the r17
    // verdict's one weak): a trickle sync's key set is delta-sized by
    // definition, but a feed-bootstrapped first sync or a large
    // backfill is corpus-entity-sized — collecting it unguarded could
    // OOM the driver at 100 TB (the same hazard readVersionKeys
    // guards with the same bound). limit(maxKeys + 1) caps the
    // collect ITSELF, not just a post-hoc check; an over-bound sync
    // falls back NON-THROWING to the full fold (the unprunable-key
    // path below — correct, just unpruned, exactly what a
    // corpus-sized sync rewrites anyway).
    // the key's CANONICAL LONG image must match what the mirror
    // writer's stats fold committed (SinglePassWriter.longAt):
    // timestamps are epoch-MICROS and dates epoch-DAYS there — a
    // plain long cast would collect epoch SECONDS for timestamps and
    // prune with mismatched units, silently skipping files that DO
    // hold changed keys (review finding, r18)
    val keyImage = images.schema(keyCol).dataType match {
      case TimestampType => unix_micros(col(keyCol))
      case DateType => datediff(col(keyCol),
        to_date(lit("1970-01-01"))).cast(LongType)
      case _ => col(keyCol).cast(LongType)
    }
    // the bound is decided on the NON-NULL distinct count, with the
    // null's presence tracked separately (review finding, r18): a
    // null row inside a naive limit(maxKeys + 1) window could shrink
    // the post-filter seq back under the bound with a TRUNCATED key
    // set — pruning with it would skip files holding the missing
    // keys' stale rows. distinct() yields at most ONE null row, so
    // limit(maxKeys + 2) makes both the non-null count (up to the
    // bound) and the null's presence exact.
    def collectKeys(image: org.apache.spark.sql.Column)
        : (Seq[org.apache.spark.sql.Row], Boolean) = {
      val rows = changedKeys.select(image.as(keyCol)).distinct()
        .limit(maxKeys + 2).collect().toSeq
      (rows.filterNot(_.isNullAt(0)), rows.exists(_.isNullAt(0)))
    }
    val (changedVals: Seq[Long], nullLongKey: Boolean) =
      if (!integralKey) (Seq.empty[Long], false)
      else { val (r, n) = collectKeys(keyImage)
        (r.map(_.getLong(0)), n) }
    val (changedStrVals: Seq[String], nullStrKey: Boolean) =
      if (!stringKey) (Seq.empty[String], false)
      else { val (r, n) = collectKeys(col(keyCol))
        (r.map(_.getString(0)), n) }
    // a NULL-keyed change is unprunable: range stats and blooms fold
    // non-null values only, so no file-level index can answer "which
    // files hold the null-keyed rows" — fall back to the full fold
    // (rare, correct, the same path an unprunable key type takes)
    val keyPrunable =
      (integralKey && !nullLongKey && changedVals.size <= maxKeys) ||
      (stringKey && !nullStrKey && changedStrVals.size <= maxKeys)
    // the BROADCAST HINT is decided on the full key-TUPLE count (r19;
    // r18 verdict watch-item 1): keyPrunable bounds only the LEAD
    // key's distinct count, but the anti-join's build side is the
    // whole key-tuple frame — a multi-column-key sync with few lead
    // values and a corpus-sized tuple set must NOT be hinted into
    // memory (AQE still picks broadcast when the actual size allows).
    // Single-key syncs reuse the lead bound (lead set = tuple set);
    // multi-key syncs pay one bounded count job (the limit caps the
    // work, same trick as the key collect above). Lazy: only computed
    // when a prunable sync actually has files to rewrite.
    lazy val tupleBounded = replicaTupleBounded(changedKeys,
      keys.size, maxKeys)
    val store = storeFor(dstRoot)
    val statsCols = if (integralKey) Seq(keyCol) else Seq.empty
    val strStatsCols = if (stringKey) Seq(keyCol) else Seq.empty
    // SCHEMA PROPAGATION (r17): the mirror is a table — after a
    // source evolution its live set mixes file generations, and its
    // own snapshot reads need the declared schema to resolve the new
    // columns (old-generation mirror files surface NULL, exactly as
    // the source's reads do). Each sync declares the source's current
    // schema on the mirror when it changed; undeclared sources
    // propagate nothing.
    val srcDdl = replayIn(storeFor(srcRoot), to).schemaDdl
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      if (lastTxn(dstRoot, appId).exists(_ >= to)) done = true
      else {
        val curV = latestVersion(dstRoot)
        // the rewrite set: only mirror files whose lead-key interval /
        // bloom can hold a changed key (stats-less files are must-
        // rewrite, so a pre-r17 unclustered mirror heals itself)
        val touched: Seq[String] = curV match {
          case Some(v) if keyPrunable && integralKey =>
            if (changedVals.isEmpty) Seq.empty
            else filesMatchingKeysIn(store, dstRoot, v, keyCol,
              changedVals)
          case Some(v) if keyPrunable && stringKey =>
            if (changedStrVals.isEmpty) Seq.empty
            else filesMatchingStrKeysIn(store, dstRoot, v, keyCol,
              changedStrVals)
          case Some(v) => filesAsOf(dstRoot, v) // unprunable/over-bound
          case None => Seq.empty
        }
        val next =
          if (touched.isEmpty) upserts
          else {
            val r = replayIn(store, curV.get)
            // plan the mirror's files under the FEED's current image
            // schema: after a source evolution the mirror mixes file
            // generations, and a footer-inferred schema would either
            // crash the union or silently DROP the new column from
            // the rewrite (old-generation rows correctly surface NULL)
            // the broadcast hint is only sound when the FULL TUPLE
            // set is bounded — an over-bound sync's changed keys are
            // corpus-entity-sized and must shuffle (AQE still picks
            // broadcast if the ACTUAL size allows)
            val changedSide =
              (if (keyPrunable && tupleBounded) broadcast(changedKeys)
               else changedKeys)
                .alias("__ck")
            val mirror = readFilesIndexed(spark, dstRoot, touched,
                r.colStats,
                r.dvs.filter { case (f, _) => touched.contains(f) },
                declaredSchema = Some(upserts.schema))
              .alias("__m")
            // NULL-SAFE key equality (review finding, r18): a plain
            // equality anti-join can never remove a NULL-keyed
            // mirror row (NULL = NULL is not true), so a rewrite of
            // a null-keyed entity would keep the stale row beside
            // its new image — the same <=> pairing the image feed
            // itself uses
            val cond = keys.map(k =>
              col(s"__m.$k") <=> col(s"__ck.$k")).reduce(_ && _)
            mirror.join(changedSide, cond, "left_anti")
              .unionByName(upserts)
          }
        val sub =
          s"data/r$to-${java.util.UUID.randomUUID().toString.take(8)}"
        val summaries = SinglePassWriter.writeFiles(
          next.repartitionByRange(nMirrorFiles, col(keyCol)),
          dstRoot, sub, statsCols, strStatsCols = strStatsCols)
        val mirrorDdl = curV.flatMap(v => replayIn(store, v).schemaDdl)
        try {
          // attested: every mirrored row already passed the SOURCE
          // table's write-side validation before it entered the feed
          commitSerializable(dstRoot, curV.getOrElse(-1L),
            adds = summaries.map(_.rel), removes = touched,
            op = "replicate", readFiles = touched.toSet,
            txn = Some((appId, to)),
            colStats = SinglePassWriter.colStatsOf(summaries, statsCols),
            strColStats =
              SinglePassWriter.strColStatsOf(summaries, strStatsCols),
            nullStats = SinglePassWriter.nullStatsOf(summaries,
              statsCols, strStatsCols),
            schemaDdl = srcDdl.filterNot(d => mirrorDdl.contains(d)),
            attest = true)
          done = true
        } catch {
          case LogicalConflict(v, d) =>
            // a winner changed files this fold read (or declared
            // metadata): abandon the attempt's files as vacuumable
            // orphans and re-derive from the fresh mirror state
            require(attempt < maxAttempts, s"replication sync lost " +
              s"$maxAttempts serializable races (last: v$v $d)")
        }
      }
    }
    to
  }

  def statsAsOf(root: String, version: Long): Map[String, FileStat] =
    statsAsOfIn(storeFor(root), version)

  def colStatsAsOf(root: String,
      version: Long): Map[String, Map[String, FileStat]] =
    colStatsAsOfIn(storeFor(root), version)

  def lastTxn(root: String, appId: String): Option[Long] =
    lastTxnIn(storeFor(root), appId)

  def filesMatching(root: String, version: Long, lo: Long,
      hi: Long): Seq[String] =
    filesMatchingIn(storeFor(root), version, lo, hi)

  def filesMatchingCols(root: String, version: Long,
      preds: Seq[(String, Long, Long)]): Seq[String] =
    filesMatchingColsIn(storeFor(root), version, preds)

  /** Snapshot read AS OF `version` pruned by the CONJUNCTION of
    * named-column range predicates (see [[filesMatchingColsIn]]); the
    * caller still applies its exact row-level filter. Falls back to
    * every live file when nothing matches (same reader contract as
    * [[readVersionWhere]]). */
  def readVersionWhereCols(spark: SparkSession, root: String,
      version: Long, preds: Seq[(String, Long, Long)]): DataFrame = {
    val matching = filesMatchingCols(root, version, preds)
    val files = if (matching.nonEmpty) matching else filesAsOf(root, version)
    readPrunedIndexed(spark, root, version, files)
  }

  /** Snapshot read AS OF `version` PRUNED to the files whose stats
    * interval intersects [lo, hi] — the caller still applies its exact
    * row-level predicate; the prune only shrinks the scan. Falls back
    * to every live file when none match (an empty parquet source list
    * is a reader error, and "nothing can match" still needs a schema). */
  def readVersionWhere(spark: SparkSession, root: String, version: Long,
      lo: Long, hi: Long): DataFrame = {
    val matching = filesMatching(root, version, lo, hi)
    val files = if (matching.nonEmpty) matching else filesAsOf(root, version)
    readPrunedIndexed(spark, root, version, files)
  }

  /** Snapshot read AS OF `version` planned through a
    * [[ManifestFileIndex]] — the production read path (r15 verdict #1):
    * Spark's scan plans DIRECTLY from the log's resolved live set (no
    * directory listing, no InMemoryFileIndex), and the manifest's
    * per-file column stats ride into the index so Catalyst's
    * pushed-down data filters prune files DURING PLANNING — the same
    * prune [[filesMatchingColsIn]] offers pre-resolution, but composed
    * with the optimizer (filter pushdown, DPP, AQE) and applied
    * automatically to ANY predicate the query writes, not just the
    * ones the caller remembered to pass.
    *
    * `statsColumn` names the column the version's SINGLE-column stats
    * ([[FileStat]] without a name) describe, mapping them into the
    * index; named colstats always ride. */
  def readVersionIndexed(spark: SparkSession, root: String, version: Long,
      statsColumn: Option[String] = None): DataFrame = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    val entries = r.files.map { f =>
      val merged = r.colStats.getOrElse(f, Map.empty[String, FileStat]) ++
        statsColumn.flatMap(c => r.stats.get(f).map(c -> _))
      entryFor(root, f, merged, r.strColStats.getOrElse(f, Map.empty),
        r.nullStats.getOrElse(f, Map.empty))
    }
    applyDvs(spark, root,
      ManifestFileIndex.read(spark, root, entries,
        declaredSchema = r.schemaDdl.map(
          org.apache.spark.sql.types.StructType.fromDDL)),
      { val live = r.files.toSet
        r.dvs.filter { case (f, _) => live(f) } })
  }

  /** Snapshot read of a HIVE-PARTITIONED manifest table (r16): the
    * live files' `k=v` path segments become partition columns
    * (LongType when every value parses as a long, StringType
    * otherwise), appended to the data schema exactly as a listed hive
    * table's would be — but the partition discovery is the LOG's file
    * list, zero directory listings. Static partition predicates prune
    * inside [[ManifestFileIndex.listFiles]]; DYNAMIC partition pruning
    * (a broadcast dim's runtime keys) composes at the scan node with
    * no extra work, because Spark re-filters the index's
    * PartitionDirectories with the runtime predicate — the
    * lake_join_dpp shape on a manifest table. Requires every live
    * file to carry the same partition segments in the same order. */
  def readVersionHive(spark: SparkSession, root: String, version: Long,
      statsColumn: Option[String] = None): DataFrame = {
    val store = storeFor(root)
    require(versionsIn(store).contains(version) ||
      checkpointVersionsIn(store).contains(version),
      s"version $version not in manifest log")
    val r = replayIn(store, version)
    require(r.files.nonEmpty, s"version $version resolves to no files")
    // ancestry-aware segment parse (r18): a shallow clone's ABSOLUTE
    // refs include the source's own ancestors — an '=' up there (a
    // temp dir named run=3) is not layout; see [[hiveSegsOf]]
    val segMap = hiveSegsOf(r.files)
    def segs(f: String): Seq[(String, String)] = segMap(f)
    // PARTITION-SPEC ADDITION (r17): the partition schema is the
    // FULLEST live file's segment list, and every other file's list
    // must be a PREFIX of it — the layout additive evolution
    // produces (new partition columns nest DEEPER; pre-evolution
    // files carry fewer segments, down to none). Files missing a
    // segment surface NULL for that column (the same semantics the
    // declared data schema gives old files); anything that isn't a
    // prefix is a genuinely mixed layout and stays loud.
    val names = r.files.map(f => segs(f).map(_._1))
      .maxBy(_.size)
    require(names.nonEmpty,
      s"no hive partition segments in any live file — use readVersion")
    require(r.files.forall(f => names.startsWith(segs(f).map(_._1))),
      "every live file's partition segments must be a prefix of the " +
        s"fullest layout $names — mixed (non-additive) layouts are " +
        "not resolvable")
    val schema = org.apache.spark.sql.types.StructType(names.map { n =>
      val vals = r.files.flatMap(f => segs(f).toMap.get(n))
      val longs = vals.forall(v => scala.util.Try(v.toLong).isSuccess)
      org.apache.spark.sql.types.StructField(n,
        if (longs) org.apache.spark.sql.types.LongType
        else org.apache.spark.sql.types.StringType,
        nullable = vals.size < r.files.size)
    })
    val entries = r.files.map { f =>
      val merged = r.colStats.getOrElse(f, Map.empty[String, FileStat]) ++
        statsColumn.flatMap(c => r.stats.get(f).map(c -> _))
      entryFor(root, f, merged, r.strColStats.getOrElse(f, Map.empty),
        r.nullStats.getOrElse(f, Map.empty))
    }
    applyDvs(spark, root,
      ManifestFileIndex.read(spark, root, entries, schema,
        declaredSchema = r.schemaDdl.map(
          org.apache.spark.sql.types.StructType.fromDDL)),
      { val live = r.files.toSet
        r.dvs.filter { case (f, _) => live(f) } })
  }

  private def entryFor(root: String, rel: String,
      stats: Map[String, FileStat],
      strStats: Map[String, StrStat] = Map.empty,
      nullStats: Map[String, NullStat] = Map.empty): ManifestFileEntry = {
    val p = resolvePath(root, rel).toPath
    ManifestFileEntry(rel, Files.size(p), stats,
      Files.getLastModifiedTime(p).toMillis, strStats, nullStats)
  }

  /** Index-planned scan over an explicit pre-resolved file list (the
    * legacy prune helpers' read half), merge-on-read-filtered when any
    * of the files carries a deletion vector. */
  private def readFilesIndexed(spark: SparkSession, root: String,
      files: Seq[String],
      stats: Map[String, Map[String, FileStat]] = Map.empty,
      dvs: Map[String, DvRef] = Map.empty,
      declaredSchema: Option[org.apache.spark.sql.types.StructType] =
        None,
      nullStats: Map[String, Map[String, NullStat]] = Map.empty)
      : DataFrame =
    applyDvs(spark, root,
      ManifestFileIndex.read(spark, root,
        files.map(f => entryFor(root, f, stats.getOrElse(f, Map.empty),
          nullStats = nullStats.getOrElse(f, Map.empty))),
        declaredSchema = declaredSchema),
      { val fileSet = files.toSet
        dvs.filter { case (f, _) => fileSet(f) } })

  /** The abs-path string a [[ManifestFileIndex]] scan reports in
    * `_metadata.file_path` for the live file `rel` — the SAME
    * construction the index uses for its FileStatus, so DV joins and
    * builders key on scan-reported identity, never on a re-derived
    * format. */
  private def scanPath(root: String, rel: String): String =
    new org.apache.hadoop.fs.Path(
      resolvePath(root, rel).toURI).toString

  /** MERGE-ON-READ row filter: drop each file's DV-dead rows from
    * `base` (a [[ManifestFileIndex]]-planned scan over exactly the
    * files keyed in `dvs` plus any DV-less ones) by anti-joining
    * `(_metadata.file_path, _metadata.row_index)` against the decoded
    * vectors. The DV side is read DISTRIBUTED — each task decodes its
    * own sidecar's 8-byte big-endian indexes — and BROADCAST: its row
    * count is the TABLE'S DELETED-ROW count, not its size (the
    * asymmetry merge-on-read exists for), so the anti join is a
    * zero-shuffle broadcast hash join at any table size. A table whose
    * dead-row count outgrows broadcast range is overdue for
    * [[compactDvs]] — the same threshold rule real formats apply. */
  private def applyDvs(spark: SparkSession, root: String,
      base: DataFrame, dvs: Map[String, DvRef]): DataFrame = {
    if (dvs.isEmpty) return base
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val pairs = dvs.toSeq.map { case (f, d) =>
      (scanPath(root, f),
        resolvePath(root, d.sidecar).getAbsolutePath)
    }
    val dead = spark.createDataset(pairs).flatMap { case (dataPath, sc) =>
      decodeDv(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sc))).iterator.map(i => (dataPath, i))
    }.toDF("__dv_f", "__dv_idx")
    base.join(broadcast(dead),
      col("_metadata.file_path") === col("__dv_f") &&
        col("_metadata.row_index") === col("__dv_idx"),
      "left_anti")
  }

  /** DV sidecar codec, format v2 (closes SURVEY §8.3.2-1): the
    * roaring-bitmap container scheme at miniature scale — row indexes
    * are grouped by their high 48 bits into 65,536-row containers,
    * and each container serializes as whichever of roaring's two
    * canonical layouts is smaller:
    *
    *   - ARRAY (≤4096 dead rows): sorted 2-byte low-16 values —
    *     2 B/row for the sparse deletes that dominate real traffic;
    *   - BITMAP (>4096): a fixed 8 KB bit array — bounded at 0.125
    *     bits/row however dense the container gets (the raw-longs v1
    *     layout paid 8 B/row: a 10%-dead 10 M-row file cost 8 MB,
    *     this costs ≤1.25 MB).
    *
    * The 4096 threshold is roaring's own (above it the bitmap is
    * smaller by construction: 4096·2 B = 8 KB). Bytes remain a pure
    * function of the dead set — container order follows index order,
    * layouts are canonical — so sidecar writes stay idempotent under
    * task retry. v1 sidecars (raw 8-byte big-endian longs) still
    * decode: their first byte is 0 for any index < 2^56, while v2
    * leads with the format tag 2. */
  private[sources] def encodeDv(indexes: Array[Long]): Array[Byte] = {
    val sorted = indexes.distinct.sorted
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeByte(2)
    var i = 0
    while (i < sorted.length) {
      val hi = sorted(i) >>> 16
      var j = i
      while (j < sorted.length && (sorted(j) >>> 16) == hi) j += 1
      val n = j - i
      dos.writeLong(hi)
      dos.writeInt(n)
      if (n > 4096) { // bitmap container
        dos.writeByte(1)
        val bits = new Array[Byte](8192)
        var k = i
        while (k < j) {
          val lo = (sorted(k) & 0xFFFF).toInt
          bits(lo >> 3) = (bits(lo >> 3) | (1 << (lo & 7))).toByte
          k += 1
        }
        dos.write(bits)
      } else { // array container
        dos.writeByte(0)
        var k = i
        while (k < j) { dos.writeShort((sorted(k) & 0xFFFF).toInt); k += 1 }
      }
      i = j
    }
    out.toByteArray
  }

  private[sources] def decodeDv(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return Array.empty
    if (bytes(0) != 2) { // v1: raw 8-byte big-endian longs
      val buf = java.nio.ByteBuffer.wrap(bytes)
      return Array.fill(bytes.length / 8)(buf.getLong)
    }
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    in.readByte()
    val acc = Array.newBuilder[Long]
    while (in.available() > 0) {
      val hi = in.readLong()
      val n = in.readInt()
      val tpe = in.readByte()
      if (tpe == 0) {
        var k = 0
        while (k < n) { acc += (hi << 16) | (in.readShort() & 0xFFFFL); k += 1 }
      } else {
        val bits = new Array[Byte](8192)
        in.readFully(bits)
        var lo = 0
        while (lo < 65536) {
          if ((bits(lo >> 3) & (1 << (lo & 7))) != 0) acc += (hi << 16) | lo
          lo += 1
        }
      }
    }
    acc.result()
  }

  /** Build deletion vectors for the rows of `candidates` (live data
    * files of `version`) selected by `doomed` — the shared write half
    * of every merge-on-read mutation. `doomed` receives the candidate
    * scan with `__f`/`__idx` identity columns appended and must only
    * FILTER it (a predicate, a semi join against a source) — never
    * project them away. Per matched file, one task merges the file's
    * existing vector with the fresh dead rows (new DV = old ∪ new, so
    * the committed "last wins" replacement is exact), writes the
    * sidecar `<file>.v<newVersion>-<attempt>.dv` beside the data
    * (never-reuse naming with an ATTEMPT-unique token: two optimistic
    * writers racing from the same snapshot must not write the same
    * sidecar path with different vectors — the loser's bytes would
    * corrupt the winner's committed ref; task retries WITHIN one
    * attempt reuse the driver-minted token and rewrite identical
    * bytes; a lost attempt's sidecars become vacuumable orphans; the
    * superseded vector stays for time travel until vacuum), and the
    * driver receives
    * only file-count-sized (path, sidecar, n) summaries to commit.
    * Scales as O(matched rows): untouched files are never scanned
    * (callers stats-prune candidates first), no data file is ever
    * rewritten, and sidecar IO happens on the executors. */
  def buildDvs(spark: SparkSession, root: String, version: Long,
      newVersion: Long, candidates: Seq[String],
      doomed: DataFrame => DataFrame): Map[String, DvRef] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    require(candidates.nonEmpty, "buildDvs needs candidate files")
    val r = replayIn(storeFor(root), version)
    require({ val live = r.files.toSet; candidates.forall(live) },
      "DV candidates must be live files of the read version")
    // scan WITHOUT the MOR filter: already-dead rows that re-match
    // simply union into the new vector (old ∪ new dedups them).
    // DECLARED schema (r17): mixed-generation candidates on an
    // evolved table must plan under it — a footer probe from the old
    // generation would fail a predicate over the new column
    val scan = ManifestFileIndex.read(spark, root,
      candidates.map(f =>
        entryFor(root, f, r.colStats.getOrElse(f, Map.empty))),
      declaredSchema = r.schemaDdl.map(
        org.apache.spark.sql.types.StructType.fromDDL))
    val matched = doomed(
        scan.withColumn("__f", col("_metadata.file_path"))
          .withColumn("__idx", col("_metadata.row_index")))
      .select(col("__f"), col("__idx")).as[(String, Long)]
    val absToRel = candidates.map(f => scanPath(root, f) -> f).toMap
    val oldDv: Map[String, String] = candidates.flatMap(f =>
      r.dvs.get(f).map(d => f -> d.sidecar)).toMap
    // minted ONCE on the driver per buildDvs invocation: retried
    // tasks share it (idempotent rewrite of identical bytes), racing
    // WRITERS cannot (each invocation gets its own paths)
    val attemptToken = java.util.UUID.randomUUID().toString.take(8)
    matched.groupByKey(_._1)
      .mapGroups { (abs, it) =>
        val rel = absToRel(abs)
        val fresh = it.map(_._2).toArray
        val old = oldDv.get(rel).map(sc => decodeDv(
            java.nio.file.Files.readAllBytes(
              resolvePath(root, sc).toPath)))
          .getOrElse(Array.empty[Long])
        val all = (old ++ fresh).distinct.sorted
        // a shallow clone's absolute-ref file gets its vector under
        // ext/ INSIDE this root — a table owns its sidecars and never
        // writes beside the source's bytes
        val sidecar = (if (rel.startsWith("/")) s"ext$rel" else rel) +
          s".v$newVersion-$attemptToken.dv"
        val scPath = java.nio.file.Paths.get(root, sidecar)
        java.nio.file.Files.createDirectories(scPath.getParent)
        java.nio.file.Files.write(scPath, encodeDv(all))
        (rel, sidecar, all.length.toLong)
      }
      .collect()
      .map { case (rel, sc, n) => rel -> DvRef(sc, n) }.toMap
  }

  /** MERGE-ON-READ DELETE (r16) — `DELETE FROM t WHERE p` that rewrites
    * NOTHING: candidate files are stats-pruned from the predicate's
    * extractable ranges (a file whose manifest interval cannot satisfy
    * `p` is never even scanned), [[buildDvs]] turns the matching rows
    * into per-file vectors, and the commit records only the DV refs —
    * no adds, no removes, data files byte-identical. Cost is
    * O(candidate-file scan + matched rows); the copy-on-write
    * alternative (`lake_merge_cow`) pays a full rewrite of every
    * touched file. Reads of `newVersion` see the rows gone; reads of
    * `version` still see them (the old sidecar, or none, is what that
    * version references). Returns the committed refs. */
  def deleteWhereMor(spark: SparkSession, root: String, version: Long,
      newVersion: Long, predicate: org.apache.spark.sql.Column,
      policy: Option[CheckpointPolicy] = None): Map[String, DvRef] = {
    val r = replayIn(storeFor(root), version)
    val ranges = ManifestFileIndex.ranges(Seq(
      org.apache.spark.sql.GraftColumnBridge.expression(predicate)))
    val candidates = r.files.filter { f =>
      val cs = r.colStats.getOrElse(f, Map.empty)
      ranges.forall { case (c, (lo, hi)) =>
        cs.get(c).forall(st => st.max >= lo && st.min <= hi) }
    }
    val dvs =
      if (candidates.isEmpty) Map.empty[String, DvRef]
      else buildDvs(spark, root, version, newVersion, candidates,
        _.filter(predicate))
    commit(root, newVersion, Seq.empty, Seq.empty, op = "delete",
      policy = policy, dvs = dvs)
    dvs
  }

  /** The OPERATOR-level retry loop over [[commitSerializable]]
    * (closes SURVEY §8.3.2-2 for the MOR delete): a DELETE whose
    * vectors lost a logical conflict — some winner removed or
    * re-vectored a candidate file between its snapshot and its
    * publish — RE-DERIVES from a fresh snapshot (fresh candidates,
    * fresh vectors, new sidecars; the abandoned attempt's sidecars
    * become vacuumable orphans) and tries again, so concurrent
    * conflicting mutations serialize as if run one after another
    * instead of surfacing the conflict to the caller. Disjoint
    * winners never reach here — [[commitSerializable]] rebases those
    * without recomputation. This is the full optimistic-transaction
    * loop a real format's DELETE runs. Returns the committed
    * version. */
  def deleteWhereMorRetrying(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      policy: Option[CheckpointPolicy] = None,
      maxAttempts: Int = 5): Long = {
    val store = storeFor(root)
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      val read = versionsIn(store).maxOption
        .orElse(checkpointVersionsIn(store).maxOption)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed version to delete from at $root"))
      val r = replayIn(store, read)
      val ranges = ManifestFileIndex.ranges(Seq(
        org.apache.spark.sql.GraftColumnBridge.expression(predicate)))
      val candidates = r.files.filter { f =>
        val cs = r.colStats.getOrElse(f, Map.empty)
        ranges.forall { case (c, (lo, hi)) =>
          cs.get(c).forall(st => st.max >= lo && st.min <= hi) }
      }
      val dvs =
        if (candidates.isEmpty) Map.empty[String, DvRef]
        else buildDvs(spark, root, read, read + 1, candidates,
          _.filter(predicate))
      try {
        committed = commitSerializable(root, read, Seq.empty, Seq.empty,
          op = "delete", readFiles = candidates.toSet, policy = policy,
          dvs = dvs)
      } catch {
        case LogicalConflict(v, d) =>
          if (attempt >= maxAttempts) throw LogicalConflict(v,
            s"$d (gave up after $maxAttempts re-derivations)")
        // else: loop re-derives from the new latest snapshot
      }
    }
    committed
  }

  /** MERGE-ON-READ UPSERT with the full optimistic retry loop (r17;
    * extends [[deleteWhereMorRetrying]]'s re-derivation contract to
    * MERGE, the r16 verdict's task 2): matched rows die by deletion
    * vector (union-folded over each file's existing vector), their
    * post-images — `post` applied to the MOR read of the matched
    * rows, so already-dead rows produce none — land as appended
    * files, and BOTH halves publish in one atomic serializable
    * commit with the stats-pruned candidate files as the read set.
    *
    * Conflict behavior mirrors the real formats': a DISJOINT winner
    * (blind append) costs a metadata rebase of the same actions; a
    * winner that removed or re-vectored a candidate file raises
    * [[LogicalConflict]] and the loop RE-DERIVES everything from the
    * fresh snapshot — fresh candidates, vectors folded over the
    * winner's, fresh post-image files under an attempt-unique sub
    * (the lost attempt's files and sidecars become vacuumable
    * orphans, never committed state); a winner that declared
    * schema/checks metadata likewise re-derives. Post-image files
    * land through the single-pass writer so `statsCols` keep the
    * table skippable across merges. Returns the committed version. */
  def mergeMorRetrying(spark: SparkSession, root: String,
      matched: org.apache.spark.sql.Column,
      post: DataFrame => DataFrame,
      statsCols: Seq[String] = Seq.empty,
      policy: Option[CheckpointPolicy] = None,
      maxAttempts: Int = 5): Long = {
    val store = storeFor(root)
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      val read = versionsIn(store).maxOption
        .orElse(checkpointVersionsIn(store).maxOption)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed version to merge into at $root"))
      val r = replayIn(store, read)
      val ranges = ManifestFileIndex.ranges(Seq(
        org.apache.spark.sql.GraftColumnBridge.expression(matched)))
      val candidates = r.files.filter { f =>
        val cs = r.colStats.getOrElse(f, Map.empty)
        ranges.forall { case (c, (lo, hi)) =>
          cs.get(c).forall(st => st.max >= lo && st.min <= hi) }
      }
      val sub = s"data/m${read + 1}-" +
        java.util.UUID.randomUUID().toString.take(8)
      // the post-image read plans ONLY the candidate files (r18;
      // matched rows can live nowhere else — the same prune the DV
      // build uses), MOR-filtered so already-dead rows produce no
      // post-images. readVersion would scan the corpus per attempt
      // whenever the predicate is stats-opaque; this path's cost is
      // O(candidates) like the vectors'. An empty candidate set means
      // the stats REFUTE the predicate everywhere — zero matched
      // rows, shaped at zero row cost.
      val morMatched =
        if (candidates.isEmpty)
          readVersion(spark, root, read).limit(0).filter(matched)
        else readFilesIndexed(spark, root, candidates, r.colStats,
          r.dvs.filter { case (f, _) => candidates.contains(f) },
          declaredSchema = r.schemaDdl.map(
            org.apache.spark.sql.types.StructType.fromDDL))
          .filter(matched)
      val postDf = post(morMatched)
      val summaries = SinglePassWriter.writeFiles(postDf, root, sub,
        statsCols)
      val dvs =
        if (candidates.isEmpty) Map.empty[String, DvRef]
        else buildDvs(spark, root, read, read + 1, candidates,
          _.filter(matched))
      try {
        committed = commitSerializable(root, read,
          adds = summaries.map(_.rel), removes = Seq.empty,
          op = "merge", readFiles = candidates.toSet, policy = policy,
          dvs = dvs,
          colStats = SinglePassWriter.colStatsOf(summaries, statsCols),
          nullStats = SinglePassWriter.nullStatsOf(summaries, statsCols))
      } catch {
        case LogicalConflict(v, d) =>
          if (attempt >= maxAttempts) throw LogicalConflict(v,
            s"$d (gave up after $maxAttempts re-derivations)")
        // else: loop re-derives from the new latest snapshot
      }
    }
    committed
  }

  /** DV COMPACTION — the maintenance half of merge-on-read: files
    * whose vector has accumulated at least `minDead` dead rows are
    * rewritten WITHOUT them (one MOR-filtered scan of exactly those
    * files) and the commit swaps old-for-new, dropping the vectors.
    * This bounds the read path's DV tax: a table format that only
    * ever appends vectors eventually pays more in anti-join input
    * than a rewrite would cost — Delta applies the same
    * threshold-triggered rewrite. With `statsCols`, the rewrite goes
    * through [[SinglePassWriter.writeFiles]] so the compacted files
    * re-enter the commit WITH fresh [min, max] stats from the rewrite
    * pass itself — compaction restores the skipping the vectors'
    * files were committed with, at zero extra IO. Without it the new
    * files carry no stats (conservative must-read). Returns the new
    * files (empty = nothing crossed the threshold, no commit). */
  def compactDvs(spark: SparkSession, root: String, version: Long,
      newVersion: Long, minDead: Long = 1L,
      policy: Option[CheckpointPolicy] = None,
      statsCols: Seq[String] = Seq.empty): Seq[String] = {
    val r = replayIn(storeFor(root), version)
    val doomed = r.files.filter(f =>
      r.dvs.get(f).exists(_.nDeleted >= minDead))
    if (doomed.isEmpty) return Seq.empty
    val sub = s"data/c$newVersion"
    // DECLARED schema (r17): a mixed-generation rewrite planned from
    // an old-generation footer would silently DROP the new column's
    // values from the compacted files — the same hazard the replica
    // fold closed; old-generation rows correctly surface NULL
    val live = readFilesIndexed(spark, root, doomed, r.colStats,
      r.dvs.filter { case (f, _) => doomed.contains(f) },
      declaredSchema = r.schemaDdl.map(
        org.apache.spark.sql.types.StructType.fromDDL))
    // attested: a compaction is content-preserving by construction —
    // every surviving row was already committed (and validated) in
    // the files it rewrites, so re-proving constraints is redundant
    // (real formats exempt pure-layout rewrites the same way)
    if (statsCols.isEmpty) {
      live.write.parquet(s"$root/$sub")
      val adds = partFiles(root, sub)
      commit(root, newVersion, adds, removes = doomed, op = "rewrite",
        policy = policy, attest = true)
      adds
    } else {
      val summaries = SinglePassWriter.writeFiles(live, root, sub,
        statsCols)
      commit(root, newVersion, adds = summaries.map(_.rel),
        removes = doomed, op = "rewrite", policy = policy,
        colStats = SinglePassWriter.colStatsOf(summaries, statsCols),
        nullStats = SinglePassWriter.nullStatsOf(summaries, statsCols),
        attest = true)
      summaries.map(_.rel)
    }
  }

  /** RESTORE TO VERSION (r17) — roll the table's DATA STATE back to
    * `target` with one new commit, the way a real format's RESTORE
    * works (Delta's RESTORE TABLE ... VERSION AS OF): history is
    * never rewritten — the restore is itself a version, every
    * intermediate state stays time-travelable, and the rollback is
    * METADATA-SIZED at any table size because data files never move:
    *
    *   - files live now but not at `target` are REMOVED (references
    *     drop; bytes stay for time travel until vacuum);
    *   - files live at `target` but since removed are RE-ADDED, with
    *     their target-time stats / string bounds / bloom refs
    *     re-committed so the restored table prunes exactly as the
    *     original did;
    *   - a file whose deletion vector differs from its target-time
    *     state gets the TARGET vector re-asserted (DV replay is
    *     last-wins), and a file that had NO vector at `target` but
    *     does now is cleared by remove+re-add in the same commit
    *     (replay folds removes first, so the re-add lands vectorless
    *     with its stats restored).
    *
    * SCOPE — data state only: the CURRENT schema declaration and
    * CHECK constraint set stay in force (restoring data out from
    * under a later-declared constraint must not silently un-declare
    * it). Accordingly the restore commit runs the normal commit-time
    * stats proof for its re-adds; a re-add whose target-time stats
    * cannot prove a since-declared constraint is REFUSED loudly —
    * row-validate and pass `attest = true` to override.
    *
    * PRECONDITIONS, loud: `target` must still resolve (not pruned
    * past by retention), every re-added file and re-asserted DV
    * sidecar must still exist on disk (a vacuum after the removal
    * reclaimed them — the same "cannot restore past VACUUM" contract
    * Delta documents). A physical commit race re-derives from the
    * fresh snapshot and retries (the restore derivation is metadata-
    * sized, so re-deriving is the whole retry). Returns the restore
    * commit's version. */
  def restoreTo(root: String, target: Long,
      policy: Option[CheckpointPolicy] = None,
      commitMs: Option[Long] = None, attest: Boolean = false,
      maxRetries: Int = 10): Long =
    restoreToIn(storeFor(root), root, target, policy, commitMs,
      attest, maxRetries)

  /** [[restoreTo]] resolved by WALL-CLOCK (Delta's RESTORE ...
    * TIMESTAMP AS OF): roll back to the table as it was at `tsMs`,
    * under [[versionAtTimestampIn]]'s resolution contract — the
    * latest commit stamped at or before `tsMs`; a timestamp before
    * every stamped commit is loud, never a silent earliest-version
    * restore. */
  def restoreToTimestamp(root: String, tsMs: Long,
      policy: Option[CheckpointPolicy] = None,
      commitMs: Option[Long] = None, attest: Boolean = false,
      maxRetries: Int = 10): Long =
    restoreTo(root, versionAtTimestamp(root, tsMs), policy, commitMs,
      attest, maxRetries)

  /** Store-parameterized [[restoreTo]] — the seam that lets the spec
    * inject a DETERMINISTIC commit race (a store whose publish lands
    * a competing commit first) and prove the loop re-derives the
    * whole restore from the fresh snapshot, competitor included. */
  private[sources] def restoreToIn(store: LogStore, root: String,
      target: Long, policy: Option[CheckpointPolicy] = None,
      commitMs: Option[Long] = None, attest: Boolean = false,
      maxRetries: Int = 10): Long = {
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      val resolvable =
        (versionsIn(store) ++ checkpointVersionsIn(store)).distinct
      require(resolvable.contains(target),
        s"restore target $target not resolvable (have: " +
          s"${resolvable.sorted}) — pruned past by retention?")
      val cur = resolvable.max
      require(target < cur,
        s"restore target $target is already the latest version $cur")
      val rt = replayIn(store, target)
      val rc = replayIn(store, cur)
      val curSet = rc.files.toSet
      val tgtSet = rt.files.toSet
      val reAdds = rt.files.filterNot(curSet)
      val drops = rc.files.filterNot(tgtSet)
      // DV deltas on files live in BOTH states
      val both = rt.files.filter(curSet)
      val reassert = both.filter(f =>
        rt.dvs.contains(f) && rt.dvs.get(f) != rc.dvs.get(f))
      val clears = both.filter(f =>
        !rt.dvs.contains(f) && rc.dvs.contains(f))
      val adds = reAdds ++ clears
      val removes = drops ++ clears
      val dvs = (reassert ++ reAdds.filter(rt.dvs.contains))
        .map(f => f -> rt.dvs(f)).toMap
      // IDEMPOTENT (review finding, r17): the live state already
      // equals the target's — an at-least-once wrapper retrying
      // restoreTo must not append empty restore commits forever
      if (adds.isEmpty && removes.isEmpty && dvs.isEmpty)
        return cur
      // vacuum check: every byte the restored state references must
      // still exist — a silent re-add of a reclaimed file would turn
      // the next read into a FileNotFound deep inside a scan. Bloom
      // sidecars count too (r17 advice): a re-committed bloom ref
      // whose sidecar a source vacuum reclaimed would fail the next
      // point prune deep inside a read, not here where it's loud.
      (adds ++ dvs.valuesIterator.map(_.sidecar).toSeq ++
        adds.flatMap(f => rt.blooms.getOrElse(f, Map.empty)
          .valuesIterator.map(_.sidecar))).foreach { f =>
        require(Files.exists(resolvePath(root, f).toPath),
          s"restore to $target needs $f, which no longer exists on " +
            "disk — reclaimed by vacuum; restore is impossible")
      }
      try {
        commitIn(store, cur + 1, adds, removes, op = "restore",
          policy = policy,
          stats = adds.flatMap(f => rt.stats.get(f).map(f -> _)).toMap,
          colStats =
            adds.flatMap(f => rt.colStats.get(f).map(f -> _)).toMap,
          blooms =
            adds.flatMap(f => rt.blooms.get(f).map(f -> _)).toMap,
          dvs = dvs, commitMs = commitMs, attest = attest,
          strColStats =
            adds.flatMap(f => rt.strColStats.get(f).map(f -> _)).toMap,
          nullStats =
            adds.flatMap(f => rt.nullStats.get(f).map(f -> _)).toMap)
        committed = cur + 1
      } catch {
        case Conflict(_) =>
          attempts += 1
          require(attempts <= maxRetries,
            s"restore gave up after $maxRetries retries — every " +
              "attempt lost the commit race")
        // loop re-derives the whole restore from the fresh latest
      }
    }
    committed
  }

  def versions(root: String): Seq[Long] = versionsIn(storeFor(root))

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  def checkpointVersions(root: String): Seq[Long] =
    checkpointVersionsIn(storeFor(root))

  def writeCheckpoint(root: String, version: Long): Unit =
    writeCheckpointIn(storeFor(root), version)

  def filesAsOf(root: String, version: Long): Seq[String] =
    filesAsOfIn(storeFor(root), version)

  /** Snapshot read AS OF `version`, resolved through log replay —
    * never through path conventions. Plans through the manifest's own
    * [[ManifestFileIndex]] (see [[readVersionIndexed]]); any named
    * colstats the version carries prune pushed-down predicates at
    * planning time. */
  def readVersion(spark: SparkSession, root: String,
      version: Long): DataFrame =
    readVersionIndexed(spark, root, version)

  /** SNAPSHOT EXPIRATION (r17) — Iceberg's `expire_snapshots` /
    * Delta's log-retention as an EXPLICIT maintenance operator: drop
    * the time-travel tail strictly below `horizon`, without waiting
    * for a [[CheckpointPolicy]] commit to cross its interval. The
    * operator publishes a checkpoint AT `horizon` first (so `horizon`
    * and everything after stays exactly readable, including after the
    * prune), then deletes the manifests below it NEWEST-FIRST — the
    * same mid-prune safety the policy retention relies on: at every
    * instant the surviving manifests form a prefix, so a concurrent
    * reader either replays an intact prefix/checkpoint+tail (exact)
    * or fails the version-membership require (loud), never a silent
    * wrong resolution.
    *
    * Expired versions leave the RESOLVABLE set, which is exactly
    * [[vacuum]]'s keep-set domain — so `expireVersionsBefore` +
    * `vacuum` is the pair that takes a table's disk from
    * history-sized to live-sized (files referenced ONLY by expired
    * versions become sweepable). Versions below the horizon that
    * have their OWN checkpoint stay readable (checkpoints are never
    * auto-deleted — one tiny file per interval, each keeping its
    * version resolvable forever; the contract the whole log
    * documents). Returns the expired (deleted-manifest) versions,
    * ascending. */
  def expireVersionsBefore(root: String, horizon: Long): Seq[Long] = {
    val store = storeFor(root)
    require(versionsIn(store).contains(horizon) ||
      checkpointVersionsIn(store).contains(horizon),
      s"expiration horizon $horizon not in manifest log")
    writeCheckpointIn(store, horizon)
    val doomed = versionsIn(store).filter(_ < horizon)
    doomed.reverse.foreach(v => store.delete(manifestName(v)))
    doomed
  }

  /** ORPHAN-FILE GC — the VACUUM of a real table format. Deletes the
    * parquet data files under `root` that NO resolvable version
    * references: a crashed writer's landed-but-never-committed files,
    * and rewritten files whose every referencing manifest has been
    * pruned behind a checkpoint. Both are invisible to every possible
    * reader (data files are only ever reachable THROUGH the log), yet
    * hold disk forever without a sweep — at 100 TB compaction+merge
    * churn makes this sweep the difference between a table's size and
    * its history's size.
    *
    * SAFETY: the keep-set is the union of live sets over EVERY
    * resolvable version (all surviving manifests + all checkpoints),
    * plus every bloom sidecar those versions reference — so every
    * read, time travel and point prune that worked before the vacuum
    * works after it, byte-identical (pinned by ManifestLogSpec).
    * Only `*.parquet` data files and `*.bloom`/`*.dv` sidecars are
    * candidates (logs and markers are never touched) — a lost MOR
    * attempt's abandoned vectors sweep here too. Returns the
    * deleted relative paths, sorted.
    *
    * `exclude` lists root-relative directory prefixes the sweep must
    * not enter — for roots that co-locate NON-table files with the
    * table (a streaming ingest's landing dir holds the stream's
    * SOURCE parquet under the same root; sweeping it would delete
    * the input and break any later resume — r15 advice). The table's
    * own data files are never excludable by accident: callers pass
    * only their known side-directory names.
    *
    * `dryRun` (r16) reports the would-be sweep set WITHOUT deleting —
    * the operational safety valve every real format's VACUUM ships
    * (an operator reviews what retention is about to reclaim before
    * an irreversible sweep). The returned list is byte-identical to
    * what the real sweep would delete. */
  def vacuum(root: String, exclude: Seq[String] = Seq.empty,
      dryRun: Boolean = false): Seq[String] = {
    val store = storeFor(root)
    val keep = vacuumKeepSet(store)
    val rootPath = Paths.get(root)
    val logRoot = logDir(root)
    val orphans = Using.resource(Files.walk(rootPath)) {
      _.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.startsWith(logRoot))
        .filter { p => val n = p.getFileName.toString
          n.endsWith(".parquet") || n.endsWith(".bloom") ||
            n.endsWith(".dv") }
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(p => rootPath.relativize(p).toString)
        .filterNot(rel => exclude.exists(e =>
          rel == e || rel.startsWith(e + "/")))
        .filterNot(keep)
        .toSeq
    }.sorted
    if (!dryRun)
      orphans.foreach(f => Files.deleteIfExists(rootPath.resolve(f)))
    orphans
  }

  /** The union of every resolvable version's referenced paths — live
    * files, their bloom sidecars, and live-file DV sidecars — folded
    * INCREMENTALLY (r18; found by the log-scale probe): the old fold
    * ran a FULL replay per resolvable version, O(versions × live
    * files) — ~40 minutes at 512 surviving versions over 1M files.
    * This fold seeds ONE replay at the oldest resolvable version and
    * walks the surviving manifests forward, accumulating only each
    * version's ADDITIONS (a union over versions never shrinks, so
    * removes need no re-accumulation; a file live at any resolvable
    * version entered keep either in the seed or at its adding
    * manifest). A resolvable version whose predecessor is missing —
    * an isolated pre-horizon checkpoint — re-seeds with its own
    * checkpoint replay; re-seed count is O(isolated checkpoints).
    * Total cost: one checkpoint parse + one pass over the surviving
    * tail, manifest-sized. */
  private def vacuumKeepSet(store: LogStore): Set[String] = {
    val manifests = versionsIn(store).toSet
    val resolvable =
      (versionsIn(store) ++ checkpointVersionsIn(store)).distinct.sorted
    val keep = scala.collection.mutable.Set.empty[String]
    var stateV = Long.MinValue
    resolvable.foreach { v =>
      if (stateV == v - 1 && manifests.contains(v)) {
        // warm fold: this manifest's additions are the only NEW
        // referenced paths this version can introduce
        val json = store.read(manifestName(v))
        keep ++= field(json, "adds")
        keep ++= parseBlooms(field(json, "blooms"),
          legacyDefault = field(json, "fmt").isEmpty).valuesIterator
          .flatMap(_.valuesIterator.map(_.sidecar))
        // a committed dv's file is live at this version by the commit
        // invariants (dvs never target a file the commit removes)
        keep ++= parseDvs(field(json, "dvs")).valuesIterator
          .map(_.sidecar)
      } else {
        // seed (first version, or a gap after an isolated checkpoint)
        val r = replayIn(store, v)
        keep ++= r.files
        keep ++= r.blooms.valuesIterator.flatMap(
          _.valuesIterator.map(_.sidecar))
        // each resolvable version's MOR reads need ITS deletion
        // vectors (live files only — a dv whose file was removed is
        // dead weight)
        keep ++= { val live = r.files.toSet
          r.dvs.collect { case (f, d) if live(f) => d.sidecar } }
      }
      stateV = v
    }
    keep.toSet
  }

  /** Relative paths of ALL parquet part-files under `root/$sub`,
    * recursively — the commit helper for hive-partitioned writes
    * (`partitionBy` lays part files under `k=v` subdirectories). */
  def partFilesRecursive(root: String, sub: String): Seq[String] = {
    val rootPath = Paths.get(root)
    Using.resource(Files.walk(Paths.get(root, sub))) {
      _.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("."))
        .map(p => rootPath.relativize(p).toString)
        .toSeq
    }.sorted
  }

  /** Relative paths of the parquet part-files under `root/$sub`. */
  def partFiles(root: String, sub: String): Seq[String] = {
    val dir = Paths.get(root, sub)
    Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq).sorted.map(n => s"$sub/$n")
  }
}
