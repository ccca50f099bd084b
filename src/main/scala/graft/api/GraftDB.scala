package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.docstore.{DocCollection, DocStore, StructuredQuery}
import java.nio.file.{Files, Paths}

/** Parquet-backed document database with the reference's mutation
  * semantics (reference: src/storage/src/db_store_v2.rs apply_mutation;
  * src/node/src/rollup_executor.rs process/gc; proto
  * db3_mutation_v2.proto MutationAction + DocumentMask).
  *
  * Layout under `root`:
  * {{{
  *   <db>/<collection>/mutations/   append-only mutation log (parquet)
  *   <db>/<collection>/rollups/     compacted gzip batches + manifest
  * }}}
  *
  * A mutation row = (block, order, action, id, doc, mask) — the exact
  * MutationHeader ordering key of the reference. Live state is the
  * latest-wins fold with DocumentMask merge and delete tombstones,
  * computed distributed (one shuffle on doc id).
  *
  * Scale posture: the log is append-only parquet partitioned by block
  * range; materialization shuffles once on id; rollup compaction is the
  * reference's Arweave batch write re-expressed as gzip parquet + manifest,
  * and `recover()` proves state is reconstructible from rollups alone.
  *
  * Concurrency: like the reference's storage node, writes assume a single
  * sequencer — the (block, order) stamps come from one writer. Readers
  * are safe concurrently; concurrent writers would need an external
  * sequencer for block assignment.
  */
/** @param pinnedAdmin fix the node admin at construction (the reference
  *   pins `admin_addr` at node boot — system_impl.rs:50): when set, ONLY
  *   this address can ever `setup`, including the first time. When None,
  *   the first successful signed setup pins the admin
  *   (trust-on-first-use). */
class GraftDB(spark: SparkSession, root: String,
    pinnedAdmin: Option[String] = None) {
  import GraftDB._

  /** Crash-injection hook (tests only): called with a window label at
    * every point where dying between a data write and its manifest/state
    * commit would leave the protocol mid-flight. `GraftDBCrashSpec` makes
    * it throw to prove each window recovers to the pre-crash or
    * post-commit state — never between. Default no-op. */
  private[api] var failpoint: String => Unit = _ => ()

  private def collPath(db: String, coll: String) = s"$root/$db/$coll"
  private def mutPath(db: String, coll: String) = s"${collPath(db, coll)}/mutations"
  private def rollPath(db: String, coll: String) = s"${collPath(db, coll)}/rollups"
  private def statePath(db: String, coll: String) = s"${collPath(db, coll)}/state/state.json"
  private def manifestPath(db: String, coll: String) = s"${collPath(db, coll)}/manifest"
  private def snapPath(db: String, coll: String, block: Long) =
    s"${collPath(db, coll)}/snapshots/block_$block"

  def createCollection(db: String, coll: String): Unit = {
    Files.createDirectories(Paths.get(mutPath(db, coll)))
    Files.createDirectories(Paths.get(rollPath(db, coll)))
  }

  // ---- block/id state cell -------------------------------------------
  // The reference keeps (block, order) in a single tiny KV cell and bumps
  // it per mutation batch (mutation_store.rs:444
  // increase_block_return_last_state) — O(1) per append. The analog: a
  // one-line JSON state file per collection, written atomically
  // (temp + move). Reading the whole mutation log to find max(block) on
  // every write — the round-1 shape — is O(log) per append and a scale
  // wall on a 100 TB log.

  private def readState(db: String, coll: String): Option[CollState] = {
    val p = Paths.get(statePath(db, coll))
    if (!Files.exists(p)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      Some(JsonMethods.parse(Files.readString(p)).extract[CollState])
    }
  }

  private def writeState(db: String, coll: String, s: CollState): Unit = {
    import org.json4s.jackson.Serialization
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val p = Paths.get(statePath(db, coll))
    Files.createDirectories(p.getParent)
    // unique tmp: the legacy-fallback persist in currentState can run
    // OUTSIDE the collection lock (read paths), so two concurrent
    // writers must not race one shared tmp name
    val tmp = p.resolveSibling(
      s"state.json.tmp.${java.util.UUID.randomUUID.toString.take(8)}")
    Files.writeString(tmp, Serialization.write(s))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Current (lastBlock, nextId). Reads the state cell; falls back to one
    * full-log scan ONLY for legacy collections written before the cell
    * existed (and persists the result, so the scan never repeats). */
  private def currentState(db: String, coll: String): CollState =
    readState(db, coll).getOrElse {
      val log = mutationLog(db, coll)
      val s =
        if (log.isEmpty) CollState(-1L, 0L)
        else {
          val r = log.agg(max(col("block")), max(col("id"))).head()
          CollState(r.getLong(0), r.getLong(1) + 1L)
        }
      writeState(db, coll, s)
      s
    }

  /** The next block a writer would stamp — state-cell read, no log scan.
    * (The single-sequencer assumption above applies: concurrent callers
    * would race the reservation.) */
  def nextBlockId(db: String, coll: String): Long =
    currentState(db, coll).lastBlock + 1L

  // ---- per-sender nonce state ----------------------------------------
  // The reference's replay protection (storage/src/state_store.rs:120,171
  // get_nonce/incr_nonce; RPC db3_storage.proto GetNonce): the node keeps
  // one u64 "used nonce" per sender address, GetNonce answers used+1, and
  // a write is accepted ONLY if its nonce is exactly used+1 — stale or
  // out-of-order nonces are rejected before anything is applied. The
  // analog: a node-level JSON cell (address → used nonce), written
  // atomically like the block-state cell. O(1) per write, no log scan.

  private def noncesPath = s"$root/state/nonces.json"

  /** Serialize a nonce-cell read-modify-write against BOTH same-JVM
    * instances (shared monitor keyed by the cell path) and other
    * processes on the same filesystem (an exclusive FileChannel lock on
    * a sibling lock file) — two writers on the same root can otherwise
    * interleave read→write and both accept the same nonce, which is
    * exactly the replay the cell exists to reject. */
  private def withNonceLock[T](body: => T): T = {
    val monitor = GraftDB.nonceMonitors.computeIfAbsent(
      Paths.get(noncesPath).toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized {
      val lockPath = Paths.get(s"$root/state/nonces.lock")
      Files.createDirectories(lockPath.getParent)
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try body finally lk.release()
      } finally ch.close()
    }
  }

  /** Serialize the collection's write protocol — block assignment
    * (read-state → data append → state commit), rollup drain, snapshot —
    * against BOTH same-JVM instances and other processes on the same
    * filesystem. Without it two writers read the same lastBlock and
    * stamp the SAME block twice (the reference serializes block
    * assignment through its store — mutation_store.rs:444
    * increase_block_return_last_state). Same two-level scheme as the
    * nonce cell: a JVM monitor keyed by the canonical state-cell path
    * plus an exclusive FileChannel lock on a sibling lock file (the
    * monitor also keeps same-JVM threads from tripping
    * OverlappingFileLockException). Never nested — rollup/snapshot call
    * no locked method inside their critical sections. */
  private def withCollLock[T](db: String, coll: String)(body: => T): T = {
    val monitor = GraftDB.collMonitors.computeIfAbsent(
      Paths.get(statePath(db, coll)).toAbsolutePath.normalize.toString,
      _ => new Object)
    monitor.synchronized {
      val lockPath = Paths.get(s"${collPath(db, coll)}/state/state.lock")
      Files.createDirectories(lockPath.getParent)
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try body finally lk.release()
      } finally ch.close()
    }
  }

  private def readNonces(): Map[String, Long] = {
    val p = Paths.get(noncesPath)
    if (!Files.exists(p)) Map.empty
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      JsonMethods.parse(Files.readString(p)).extract[Map[String, Long]]
    }
  }

  private def writeNonces(m: Map[String, Long]): Unit = {
    import org.json4s.jackson.Serialization
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val p = Paths.get(noncesPath)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling("nonces.json.tmp")
    Files.writeString(tmp, Serialization.write(m))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** GetNonce RPC semantics: the next nonce `sender` must sign with
    * (used + 1; 1 for a never-seen sender). */
  def getNonce(sender: String): Long =
    withNonceLock { readNonces().getOrElse(normAddr(sender), 0L) + 1L }

  /** incr_nonce semantics: accept exactly used+1, else reject — called
    * BEFORE the write is applied, like the reference's send_mutation. */
  private def checkAndIncrNonce(sender: String, nonce: Long): Unit =
    withNonceLock {
      val key = normAddr(sender)
      val m = readNonces()
      val expected = m.getOrElse(key, 0L) + 1L
      if (nonce != expected)
        throw new IllegalArgumentException(
          s"bad nonce for $key: got $nonce, expected $expected")
      writeNonces(m.updated(key, nonce))
    }

  private def normAddr(a: String): String = a.trim.toLowerCase

  /** Nonce-guarded AddDocument: rejects a stale/out-of-order nonce before
    * anything is written, then consumes it. */
  def addDocuments(db: String, coll: String, docs: Seq[String],
      sender: String, nonce: Long): Seq[Long] = {
    checkAndIncrNonce(sender, nonce)
    addDocuments(db, coll, docs)
  }

  /** Nonce-guarded partition-parallel bulk append. */
  def appendDocumentsAt(db: String, coll: String, block: Long,
      docs: DataFrame, docCol: String, sender: String, nonce: Long): Unit = {
    checkAndIncrNonce(sender, nonce)
    appendDocumentsAt(db, coll, block, docs, docCol)
  }

  /** The reference's full signed write path (node/src/
    * storage_node_light_impl.rs send_mutation → mutation_utils.rs:93
    * unwrap_and_light_verify): the request is an EIP-712 TypedData JSON
    * whose `message.payload` is hex-encoded mutation bytes (here: UTF-8
    * NDJSON, one document per line) and `message.nonce` the sender's next
    * nonce; the sender is RECOVERED from the signature — never trusted
    * from a field — then the nonce is checked-and-consumed and the docs
    * applied. Returns (recovered sender, assigned doc ids). */
  def sendMutation(db: String, coll: String,
      typedDataJson: String, sigHex: String): (String, Seq[Long]) = {
    import graft.functions.crypto.{Eip712, Keccak256}
    val recovered = Eip712.recoverAddressOrNull(typedDataJson, sigHex)
    if (recovered == null)
      throw new IllegalArgumentException("invalid signature or typed data")
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(typedDataJson)
    val msg = tree.get("message")
    if (msg == null || msg.get("payload") == null || msg.get("nonce") == null)
      throw new IllegalArgumentException("bad typed data: missing payload/nonce")
    val nonce = msg.get("nonce").asText.toLongOption.getOrElse(
      throw new IllegalArgumentException("bad typed data: non-numeric nonce"))
    val payload = Keccak256.fromHex(msg.get("payload").asText).getOrElse(
      throw new IllegalArgumentException("bad typed data: non-hex payload"))
    val docs = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    val sender = recovered.toString
    val ids = addDocuments(db, coll, docs, sender, nonce)
    (sender, ids)
  }

  /** The full mutation log: rolled-up batches + live tail, one schema.
    * Rolled-up batches are located through the persisted RollupRecord
    * manifest (the reference recovers from its rollup records the same
    * way, recover.rs over scan_rollup_records) — on an object store that
    * is one small manifest read instead of a huge eventually-consistent
    * prefix listing. Collections written before the manifest existed
    * fall back to listing rollups/ recursively.
    *
    * Reader-vs-GC contract: a reader that listed tail files BEFORE a
    * rollup's GC deleted them fails its job (FileNotFoundException) and
    * must re-plan — fail-CLOSED, never silently dropped rows (the same
    * failure mode a Delta reader has past checkpoint retention). A
    * re-created DataFrame re-lists and sees the rolled batches via the
    * manifest. */
  def mutationLog(db: String, coll: String): DataFrame = {
    // Order matters: pin the tail FILE LISTING first (InMemoryFileIndex
    // lists eagerly at DataFrame creation), THEN read the manifest. A
    // rollup whose manifest append and GC both complete between the two
    // steps then still surfaces via the manifest (the committedHi filter
    // below dedups its now-redundant tail rows), and tail files its GC
    // deleted fail the job CLOSED (FileNotFoundException, re-plan). The
    // reverse order silently loses the freshly-rolled blocks: absent
    // from the stale manifest snapshot AND from the post-GC listing.
    val tailBase =
      if (hasParquet(mutPath(db, coll)))
        Some(spark.read.schema(mutationSchema)
          .option("recursiveFileLookup", "true").parquet(mutPath(db, coll)))
      else None
    // compaction view: a compact record RETIRES the batch dirs it
    // replaced — the record append is the commit point, so a retired
    // path is dropped from reads even while its dir still exists (the
    // crash window between the append and the delete must not read rows
    // twice), and a compacted dir serves in its place
    val compactRecs = scanCompactRecords(db, coll)
      .select(col("path"), col("end_block"), col("replaced")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    val retired = compactRecs.flatMap(_._3).toSet
    val baseRecs = scanRollupRecords(db, coll)
      .select(col("path"), col("end_block")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val recs = (baseRecs.filterNot(r => retired(r._1)) ++
        compactRecs.filterNot(c => retired(c._1)).map(c => (c._1, c._2)))
      .filter { case (p, _) => hasParquet(p) }
    val manifested = recs.map(_._1)
    // blocks at or below this bound are owned by the rollup batches; a
    // rollup that crashed between its manifest append and the tail GC
    // leaves the same blocks in BOTH places — the bound keeps the
    // redundant tail copy invisible until the GC finishes. RETIRED
    // records keep counting: their blocks are owned by the manifested
    // compact dir that replaced them.
    val committedHi = {
      val ends = recs.map(_._2) ++
        (baseRecs ++ compactRecs.map(c => (c._1, c._2)))
          .filter(r => retired(r._1)).map(_._2)
      if (ends.isEmpty) -1L else ends.max
    }
    val rollReads: Seq[DataFrame] =
      if (manifested.nonEmpty)
        // recursiveFileLookup also disables partition-column inference on
        // the batch=N dir names — the file schema is the whole schema
        Seq(spark.read.schema(mutationSchema)
          .option("recursiveFileLookup", "true").parquet(manifested.toSeq: _*))
      else if (hasParquet(rollPath(db, coll)))
        Seq(spark.read.schema(mutationSchema)
          .option("recursiveFileLookup", "true").parquet(rollPath(db, coll)))
      else Seq.empty
    val tailReads = tailBase.map(t =>
      if (committedHi >= 0) t.filter(col("block") > committedHi) else t).toSeq
    val reads = rollReads ++ tailReads
    if (reads.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], mutationSchema)
    else reads.reduce(_ unionByName _)
  }

  /** One locked batch = one UNIQUE `blk_<block>_<token>` dir in the tail.
    * The token makes a crashed attempt's data distinguishable garbage: a
    * writer that dies between the data write and the state bump releases
    * the collection lock with uncommitted rows at block N on disk, and
    * the NEXT writer to stamp N (same or different process) must not let
    * those rows ride its commit — same (block, order) stamps, different
    * content, the fold would pick arbitrarily. `sweepOrphanBatchDirs`
    * (called under the lock before every block assignment) deletes the
    * orphan dirs by NAME — any blk_ dir whose block exceeds the
    * committed lastBlock is a crashed locked-writer attempt, because a
    * live one would be holding the lock we hold. A dir listing + name
    * parse per write, no data read. */
  private def append(db: String, coll: String, block: Long, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), mutationSchema)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${mutPath(db, coll)}/blk_${block}_${java.util.UUID.randomUUID.toString.take(8)}")

  private def sweepOrphanBatchDirs(db: String, coll: String, lastCommitted: Long): Unit = {
    val d = new java.io.File(mutPath(db, coll))
    val kids = d.listFiles()
    if (kids != null) kids.foreach { f =>
      if (f.isDirectory && f.getName.startsWith("blk_")) {
        val b = f.getName.drop(4).takeWhile(_ != '_')
        if (b.nonEmpty && b.forall(_.isDigit) && b.toLong > lastCommitted)
          deleteRecursively(f.toPath)
      }
    }
  }

  /** AddDocument: assigns monotonically increasing ids (doc_order analog).
    * Block/id come from the state cell — no log scan per batch. */
  def addDocuments(db: String, coll: String, docs: Seq[String]): Seq[Long] =
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      val block = st.lastBlock + 1
      val base = st.nextId
      val ids = docs.indices.map(base + _)
      append(db, coll, block, docs.zipWithIndex.map { case (d, i) =>
        Row(block, i, ActionAdd, base + i, d, null)
      })
      failpoint("addDocuments:afterAppend")
      writeState(db, coll, CollState(block, base + docs.length))
      ids
    }

  /** UpdateDocument with DocumentMask: only `mask` fields are replaced;
    * fields in the mask but absent from `doc` are deleted (the proto's
    * documented mask semantics). Empty mask = whole-doc replace. */
  def updateDocuments(db: String, coll: String, ids: Seq[Long],
      docs: Seq[String], masks: Seq[Seq[String]]): Unit = {
    require(ids.length == docs.length && ids.length == masks.length,
      s"ids/docs/masks length mismatch: ${ids.length}/${docs.length}/${masks.length}")
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      val block = st.lastBlock + 1
      append(db, coll, block, ids.indices.map { i =>
        Row(block, i, ActionUpdate, ids(i), docs(i),
          if (masks(i).isEmpty) null else masks(i).mkString(","))
      })
      failpoint("updateDocuments:afterAppend")
      writeState(db, coll, st.copy(lastBlock = block))
    }
  }

  /** DeleteDocument tombstones. */
  def deleteDocuments(db: String, coll: String, ids: Seq[Long]): Unit =
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      val block = st.lastBlock + 1
      append(db, coll, block, ids.zipWithIndex.map { case (id, i) =>
        Row(block, i, ActionDelete, id, null, null)
      })
      failpoint("deleteDocuments:afterAppend")
      writeState(db, coll, st.copy(lastBlock = block))
    }

  /** Partition-parallel bulk append of one block: every input partition
    * stamps its own rows (order = partitionId·2^20 + rowIdx, the
    * reference's (block, order) entry-id composition) and writes its own
    * parquet — no driver materialization anywhere. The block's rows land
    * in their own sub-directory with Overwrite, so a retried streaming
    * micro-batch is idempotent. Doc ids encode (block, order) like the
    * reference's DocumentEntryId; caps: 2^11 partitions × 2^20 rows per
    * block. */
  def appendDocumentsAt(db: String, coll: String, block: Long,
      docs: DataFrame, docCol: String = "doc"): Unit = {
    val stride = 1 << 20
    val rows = docs.select(col(docCol).cast("string")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        require(pid < (1 << 11), s"partition id $pid exceeds order budget")
        it.zipWithIndex.map { case (row, i) =>
          require(i < stride, s"partition row count exceeds $stride")
          val order = pid * stride + i
          Row(block, order, ActionAdd, block * IdStride + order,
            row.getString(0), null)
        }
      }
    spark.createDataFrame(rows, mutationSchema)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${mutPath(db, coll)}/block_$block")
    failpoint("appendAt:afterData")
    // data lands outside the lock (the block dir is caller-exclusive and
    // Overwrite-idempotent); only the max-merge state bump needs
    // serializing, or a concurrent bump's write could be lost
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      // a max-merge commit can advance lastBlock PAST blocks a crashed
      // locked writer left orphan dirs at (the caller's block may gap
      // over them) — sweep before the bump, while the lock guarantees
      // every blk_ dir above lastBlock is a dead attempt, or those
      // uncommitted rows would become visible under the new bound
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      writeState(db, coll, CollState(math.max(st.lastBlock, block),
        math.max(st.nextId, (block + 1) * IdStride)))
    }
  }

  /** Live document state: distributed fold of the log.
    * groupByKey(id) → chronological replay per doc (each group is the
    * handful of mutations for one doc — bounded state, shuffles once). */
  def collection(db: String, coll: String): DocCollection =
    collectionAt(db, coll, Long.MaxValue)

  // ---- state snapshots ------------------------------------------------
  // Without snapshots every read folds the WHOLE log — O(history), the
  // thing that kills a long-lived 100 TB collection whose live state is a
  // fraction of its mutation history. A snapshot materializes the folded
  // state at block B once; later reads seed the fold from the snapshot
  // and replay only blocks > B. The reference gets the same effect from
  // its materialized index-node state (db_store_v2.rs holds current docs;
  // the log is for recovery/audit) — here the snapshot IS that
  // materialized state, versioned and manifest-tracked.

  /** Materialize the folded state as of `block` (defaults to the last
    * stamped block) under snapshots/ and record it in the manifest.
    * Returns (block, docCount). */
  def snapshot(db: String, coll: String, block: Long = Long.MinValue): (Long, Long) =
    withCollLock(db, coll) {
      val at = if (block == Long.MinValue) currentState(db, coll).lastBlock else block
      val dir = snapPath(db, coll, at)
      foldLog(db, coll, at).write.mode(SaveMode.Overwrite).parquet(dir)
      failpoint("snapshot:afterData")
      val n = spark.read.parquet(dir).count()
      appendManifest(s"${manifestPath(db, coll)}/snapshot",
        Seq(Row(at, n, dir)), snapshotManifestSchema)
      (at, n)
    }

  /** Persisted snapshot history (block, n_docs, path). */
  def scanSnapshots(db: String, coll: String): DataFrame = {
    val dir = s"${manifestPath(db, coll)}/snapshot"
    if (hasParquet(dir)) spark.read.schema(snapshotManifestSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snapshotManifestSchema)
  }

  /** Newest usable snapshot at or below `block`, if any. */
  private def latestSnapshotAt(db: String, coll: String, block: Long): Option[(Long, String)] =
    scanSnapshots(db, coll)
      .filter(col("block") <= block)
      .orderBy(col("block").desc).limit(1)
      .collect().headOption
      .map(r => (r.getLong(0), r.getString(2)))
      .filter { case (_, p) => hasParquet(p) }

  /** Time-travel read: live state as of `block` (inclusive) — the
    * blockchain-versioned view the reference's (block,order)-stamped log
    * makes natural. Seeds from the newest snapshot ≤ block when one
    * exists (snapshot docs enter the fold as synthetic AddDocument rows
    * ordered before every replayed mutation) and replays only the blocks
    * after it; otherwise folds the full truncated log. */
  def collectionAt(db: String, coll: String, block: Long): DocCollection =
    DocCollection(coll, foldLog(db, coll, block))

  /** Point-lookup fold: replay ONLY the given doc ids. The id filter is
    * applied to the raw mutation-log scan — ids are In-pushed into the
    * parquet reader. ADD mutations are id-disjoint per block file (ids
    * encode (block, order)), so row-group min/max stats skip every block
    * whose adds cannot contain the ids; UPDATE/DELETE mutations carry the
    * ORIGINAL doc id into later blocks, widening those blocks' id ranges
    * and reducing (never breaking — the In filter still matches all of a
    * doc's mutations) the skip rate on update-heavy logs. A selective
    * lookup on an append-mostly log thus reads O(matching blocks) and
    * shuffles only the matching mutations instead of folding the whole
    * log — the B-tree fetch analog of the reference's `doc_store.rs
    * get_doc`. */
  def collectionForIds(db: String, coll: String, ids: Seq[Long]): DocCollection =
    DocCollection(coll, foldLog(db, coll, Long.MaxValue, Some(ids)))

  /** GetDoc RPC analog (db3_indexer.proto:64; doc_store.rs:240 get_doc):
    * one doc's live JSON by id, or None if absent/tombstoned. Reads
    * through the pruned point-lookup fold above — O(matching blocks). */
  def getDoc(db: String, coll: String, id: Long): Option[String] =
    collectionForIds(db, coll, Seq(id)).df
      .select("doc").head(1).headOption.map(_.getString(0))

  private def foldLog(db: String, coll: String, block: Long,
      onlyIds: Option[Seq[Long]] = None): DataFrame = {
    import spark.implicits._
    // COMMIT POINT = the state cell (Delta-style: data files land first,
    // invisible; the atomic cell flip publishes them). Rows whose block
    // is beyond the committed lastBlock are a crashed writer's in-flight
    // append and must not surface until their writer commits.
    val committed = math.min(block, currentState(db, coll).lastBlock)
    val source = latestSnapshotAt(db, coll, committed) match {
      case Some((snapBlock, path)) =>
        val seed = spark.read.parquet(path)
          .select(col("_id").as("id"), col("doc"))
          .withColumn("block", lit(snapBlock))
          .withColumn("order", lit(Int.MinValue))
          .withColumn("action", lit(ActionAdd))
          .withColumn("mask", lit(null).cast("string"))
          .select("block", "order", "action", "id", "doc", "mask")
        // block > snapBlock prunes rolled-up batches and block_N tail
        // dirs by parquet row-group stats — the replay reads O(tail)
        seed.unionByName(mutationLog(db, coll)
          .filter(col("block") > snapBlock && col("block") <= committed))
      case None =>
        mutationLog(db, coll).filter(col("block") <= committed)
    }
    val filtered = onlyIds match {
      case Some(ids) => source.filter(col("id").isin(ids: _*))
      case None => source
    }
    filtered
      .as[MutationRow]
      .groupByKey(_.id)
      .mapGroups { (id, muts) =>
        // a crashed-then-retried append lands the same (block, order)
        // stamp twice (at-least-once data, exactly-once commit); replay
        // each stamp once — duplicates are adjacent after the sort
        val ordered = muts.toSeq.sortBy(m => (m.block, m.order))
          .foldLeft(List.empty[MutationRow]) {
            case (acc @ (p :: _), m)
                if p.block == m.block && p.order == m.order => acc
            case (acc, m) => m :: acc
          }.reverse
        var doc: String = null
        ordered.foreach { m =>
          m.action match {
            case ActionAdd => doc = m.doc
            case ActionDelete => doc = null
            case ActionUpdate =>
              if (doc != null) doc = mergeMasked(doc, m.doc, Option(m.mask))
            case _ =>
          }
        }
        (id, doc)
      }
      .filter(_._2 != null)
      .toDF("_id", "doc")
  }

  def query(db: String, coll: String, q: StructuredQuery): DataFrame =
    DocStore.query(collection(db, coll), q)

  /** The reference SDK's queryDoc surface: an EJDB-style query string with
    * optional bound parameters (`/[age = :age]`). */
  def queryStr(db: String, coll: String, q: String,
      params: Map[String, graft.docstore.FieldValue] = Map.empty): DataFrame = {
    val parsed = graft.docstore.QueryStr.parse(q, params)
    val res = DocStore.queryFused(collection(db, coll), parsed.sq)
    if (parsed.count) res.agg(count(lit(1)).as("count")) else res
  }

  /** Rollup (rollup_executor.rs:256 `process`): drain the live mutation
    * tail into SIZE-BOUNDED gzip parquet batches under rollups/ — batches
    * are whole blocks in block order, cut when the running payload size
    * crosses `maxBatchBytes` (the reference drains the log into multiple
    * batches bounded by size/interval, never one unbounded blob). Every
    * batch writes a RollupRecord row into the persisted manifest
    * (mutation_store.rs:291 add_rollup_record); the GC'd tail writes a
    * GcRecord (mutation_store.rs:248 add_gc_record).
    *
    * Scale shape: batch assignment windows over the PER-BLOCK size frame
    * (#blocks rows, not #mutations), the assignment broadcast-joins back,
    * and the write is one distributed partitionBy(batch) pass sorted by
    * (block, order) — compaction parallelism = #batches, no
    * repartition(1) single-core gzip. */
  def rollup(db: String, coll: String,
      maxBatchBytes: Long = 64L * 1024 * 1024): Seq[RollupRecord] =
    // the collection lock serializes racing rollups (two drains would
    // write the same runDir and manifest the same blocks twice) and
    // fences the tail FILE LISTING against writer appends: everything
    // this run rolls and GCs is pinned to the listing below, so a writer
    // queued on the lock can never lose its new block to the GC
    withCollLock(db, coll) { rollupLocked(db, coll, maxBatchBytes) }

  private def rollupLocked(db: String, coll: String,
      maxBatchBytes: Long): Seq[RollupRecord] = {
    val tailDir = mutPath(db, coll)
    if (!hasParquet(tailDir)) return Seq.empty
    val rawTail = spark.read.schema(mutationSchema)
      .option("recursiveFileLookup", "true").parquet(tailDir)
    // Only blocks <= the state cell's lastBlock are fully committed: the
    // state bump happens under this lock strictly AFTER the data commit,
    // while appendDocumentsAt's data write (and Spark's non-atomic
    // part-file commit renames) happen OUTSIDE it. A listing taken
    // mid-commit would otherwise capture a SUBSET of the block's part
    // files, roll that subset, and leave the late-renamed rest to be
    // deleted as "redundant" by the next rollup's GC — silent row loss.
    // Bounding BOTH the drained set and the GC file list to committed
    // blocks closes the window: the mid-commit block stays untouched
    // until its writer's state bump (under this same lock) commits it.
    val lastCommitted = currentState(db, coll).lastBlock
    val fileStats = rawTail
      .groupBy(input_file_name().as("f"))
      .agg(min(col("block")).as("lo"), max(col("block")).as("hi"),
        count(lit(1)).as("n"))
      .filter(col("hi") <= lastCommitted)
      .collect() // rows = tail files being drained, bounded by the drain
    if (fileStats.isEmpty) return Seq.empty
    val tailFiles = fileStats.map(_.getString(0))
    val (rawLo, rawHi, rawN) = (fileStats.map(_.getLong(1)).min,
      fileStats.map(_.getLong(2)).max, fileStats.map(_.getLong(3)).sum)
    val committedTail = rawTail.filter(col("block") <= lastCommitted)
    // idempotent re-entry: blocks already manifest-committed by a prior
    // (possibly crashed) run never roll twice — the manifest is the
    // commit point, the tail copy is redundant data awaiting GC
    val committedHi = {
      val r = scanRollupRecords(db, coll).agg(max(col("end_block"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    val tail = committedTail.filter(col("block") > committedHi)
    if (tail.isEmpty) {
      // every tail row is already rolled (crash landed between the
      // manifest append and the tail GC, or a replayed micro-batch
      // re-appended rolled blocks): finish the GC and stop
      finishGc(db, coll, tailFiles, rawLo, rawHi, rawN)
      return Seq.empty
    }
    val rowBytes = coalesce(length(col("doc")).cast("long"), lit(0L)) +
      coalesce(length(col("mask")).cast("long"), lit(0L)) + lit(24L)
    // The running-size fold is keyed by a 4096-block epoch (the
    // rollup_batches query's "batches never span days" pattern,
    // EventQueries.rollupAssigned): batches never span epochs, so the
    // fold parallelizes across epochs and an unbounded outage tail can
    // never serialize into one window task. Batch id = epoch * 4096 +
    // dense_rank of the within-epoch size cut: the dense rank is
    // provably <= #blocks in the epoch (<= 4096), so epoch id spaces
    // never collide — a raw floor(running/maxBatchBytes) cut would
    // overflow its epoch whenever the epoch's tail bytes exceed
    // 4096*maxBatchBytes (one oversized block suffices) and merge rows
    // of different epochs into one partition dir. The rank inherits the
    // cut's monotonicity in block order, so batch ids stay monotone.
    val epochBlocks = 4096L
    val byEpoch = Window.partitionBy(col("epoch")).orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byCut = Window.partitionBy(col("epoch")).orderBy(col("cut"))
    val assign = tail.groupBy(col("block"))
      .agg(sum(rowBytes).as("bytes"))
      .withColumn("epoch", floor(col("block") / epochBlocks))
      .withColumn("running", sum(col("bytes")).over(byEpoch))
      .withColumn("cut",
        ((col("running") - col("bytes")) / maxBatchBytes).cast("long"))
      .withColumn("batch", col("epoch") * epochBlocks +
        dense_rank().over(byCut) - 1)
      .select(col("block"), col("batch"))
    val (lo, hi) = {
      val r = tail.agg(min(col("block")), max(col("block"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val runDir = s"${rollPath(db, coll)}/run_${lo}_$hi"
    tail.join(broadcast(assign), Seq("block"))
      .repartition(col("batch"))
      .sortWithinPartitions("batch", "block", "order")
      .write.partitionBy("batch").mode(SaveMode.Overwrite)
      .option("compression", "gzip").parquet(runDir)
    failpoint("rollup:afterData")
    // per-batch stats: #batches rows of metadata on the driver (the
    // reference's record list lives in RocksDB the same way)
    val records = tail.join(broadcast(assign), Seq("block"))
      .groupBy(col("batch"))
      .agg(min(col("block")).as("lo"), max(col("block")).as("hi"),
        count(lit(1)).as("n"), sum(rowBytes).as("raw"))
      .orderBy(col("batch"))
      .collect()
      .map { r =>
        val path = s"$runDir/batch=${r.getAs[Long]("batch")}"
        RollupRecord(r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Long]("n"), dirSize(path), r.getAs[Long]("raw"), path)
      }.toSeq
    appendManifest(s"${manifestPath(db, coll)}/rollup", records.map(rec =>
      Row(rec.startBlock, rec.endBlock, rec.mutationCount,
        rec.compressedBytes, rec.rawBytes, rec.path)), rollupManifestSchema)
    failpoint("rollup:afterManifest")
    // GC the rolled-up tail. The GcRecord covers the WHOLE deleted tail
    // (rawLo..rawHi — includes any redundant rows a crashed prior run
    // left behind) and is written BEFORE the delete: a crash between the
    // two leaves the record in place and the re-entry branch above skips
    // the duplicate append while finishing the delete.
    finishGc(db, coll, tailFiles, rawLo, rawHi, rawN)
    records
  }

  /** GC the rolled tail FILES — never the directory: a block appended
    * after this rollup's tail listing (e.g. by a writer that queued on
    * the collection lock, or a streaming micro-batch mid-write in its
    * own block dir) must survive the sweep. Appends the GcRecord exactly
    * once (idempotent under crash-retry: skips the append when
    * (start, end) is already recorded); block subdirs emptied by the
    * sweep are pruned, non-empty ones (including a concurrent writer's
    * _temporary) are left alone. */
  private def finishGc(db: String, coll: String, tailFiles: Array[String],
      lo: Long, hi: Long, n: Long): Unit = {
    val recorded = scanGcRecords(db, coll)
      .filter(col("start_block") === lo && col("end_block") === hi)
      .limit(1).count() > 0
    if (!recorded)
      appendManifest(s"${manifestPath(db, coll)}/gc",
        Seq(Row(lo, hi, n)), gcManifestSchema)
    failpoint("rollup:afterGc")
    val parents = scala.collection.mutable.LinkedHashSet[java.nio.file.Path]()
    tailFiles.foreach { f =>
      // input_file_name() strings are percent-encoded file: URIs (a
      // root with a space arrives as file:///a%20b/...), so they must
      // go through java.net.URI to decode; the Hadoop-Path roundtrip
      // would leave a literal "%20" and silently never delete the tail.
      // Fall back to the raw Path rendering only if URI parsing rejects
      // the string, so a malformed name can't abort the sweep after the
      // GcRecord was appended.
      val fp =
        try Paths.get(new java.net.URI(f))
        catch { case _: Exception =>
          Paths.get(new org.apache.hadoop.fs.Path(f).toUri.getPath)
        }
      Files.deleteIfExists(fp)
      Files.deleteIfExists(fp.resolveSibling("." + fp.getFileName + ".crc"))
      parents += fp.getParent
    }
    parents.foreach { d =>
      // drop write-commit litter, then the dir itself if truly empty
      Seq("_SUCCESS", "._SUCCESS.crc").foreach(m =>
        Files.deleteIfExists(d.resolve(m)))
      val empty = {
        val st = Files.list(d)
        try !st.findFirst().isPresent finally st.close()
      }
      val n = d.getFileName.toString
      if (empty && (n.startsWith("block_") || n.startsWith("blk_")))
        Files.delete(d)
    }
  }

  private def appendManifest(dir: String, rows: Seq[Row], schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(SaveMode.Append).parquet(dir)

  /** Persisted rollup history (mutation_store.rs:430 scan_rollup_records). */
  def scanRollupRecords(db: String, coll: String): DataFrame = {
    val dir = s"${manifestPath(db, coll)}/rollup"
    if (hasParquet(dir)) spark.read.schema(rollupManifestSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rollupManifestSchema)
  }

  /** On-disk size of the live (un-rolled-up) mutation tail — the rollup
    * executor's trigger metric (rollup_executor.rs periodic size check). */
  def tailBytes(db: String, coll: String): Long = dirSize(mutPath(db, coll))

  /** Persisted GC history (mutation_store.rs scan_gc_records). */
  def scanGcRecords(db: String, coll: String): DataFrame = {
    val dir = s"${manifestPath(db, coll)}/gc"
    if (hasParquet(dir)) spark.read.schema(gcManifestSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], gcManifestSchema)
  }

  /** Persisted rollup-compaction history: each record publishes one
    * compacted batch dir and retires the dirs it replaced. */
  def scanCompactRecords(db: String, coll: String): DataFrame = {
    val dir = s"${manifestPath(db, coll)}/compact"
    if (hasParquet(dir)) spark.read.schema(compactManifestSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], compactManifestSchema)
  }

  /** OPTIMIZE tick for the rollup store — `Layout.compactSmallFiles`'
    * discipline applied to GraftDB-owned batch dirs, under the
    * collection lock (every retired path is manifest-listed, so this
    * never touches a concurrent writer's tail): every rollup RUN's last
    * batch is size-truncated, so runs accumulate small dirs under
    * rollups/ that a 100 TB log would fragment into thousands of tiny
    * gzip files. Adjacent (in block order) batches whose sizes sum
    * below `targetBytes` are rewritten into one dir sorted by
    * (block, order) — the fold is unchanged: same schema, same rows,
    * and read order never depended on file layout. Publish discipline:
    * the compacted dir is written first, the append-only COMPACT RECORD
    * is the commit point (readers switch to the new dir and drop the
    * replaced paths the moment it lands). Retired dirs are NOT deleted
    * in the same call: `collection()` DataFrames are lazy and hold
    * their file listing from plan time, so a reader that planned before
    * the record and executes after it would hit FileNotFoundException
    * on an immediate delete (the collection lock is writer-side only).
    * Deletion is deferred to the NEXT call's self-heal pass — a full
    * tick's grace period for in-flight plans to drain. Crash before the
    * record → an orphan compact dir invisible to readers; crash after →
    * the same lingering-retired state the no-crash path now leaves;
    * both kinds of litter are swept by the next call. Returns the
    * number of bins compacted. */
  def compactRollups(db: String, coll: String,
      targetBytes: Long = 64L * 1024 * 1024): Int = withCollLock(db, coll) {
    val rollBase = rollPath(db, coll)
    val compactRows = scanCompactRecords(db, coll).collect()
    val known = compactRows.map(_.getAs[String]("path")).toSet
    val retired = compactRows.flatMap(_.getSeq[String](5)).toSet
    // self-heal: orphan compact dirs (crash before their record) and
    // lingering retired dirs (crash after their replacement's record)
    val rollDirFile = new java.io.File(rollBase)
    if (rollDirFile.isDirectory)
      rollDirFile.listFiles().foreach { d =>
        val p = s"$rollBase/${d.getName}"
        if (d.getName.startsWith("compact_") && !known.contains(p))
          deleteRecursively(d.toPath)
      }
    retired.foreach { p =>
      val fp = Paths.get(p)
      if (Files.exists(fp)) deleteRecursively(fp)
    }
    // live batch dirs in block order (base records minus retired, plus
    // un-retired compact dirs)
    val baseRecs = scanRollupRecords(db, coll).collect().map(r =>
      (r.getAs[Long]("start_block"), r.getAs[Long]("end_block"),
        r.getAs[Long]("mutation_count"), r.getAs[String]("path")))
    val liveCompact = compactRows
      .filterNot(r => retired(r.getAs[String]("path")))
      .map(r => (r.getAs[Long]("start_block"), r.getAs[Long]("end_block"),
        r.getAs[Long]("mutation_count"), r.getAs[String]("path")))
    val live = (baseRecs.filterNot(r => retired(r._4)) ++ liveCompact)
      .filter(r => hasParquet(r._4))
      .sortBy(_._1)
    // greedy adjacent bins below the target; only multi-member bins work
    val bins = scala.collection.mutable.ArrayBuffer[Vector[(Long, Long, Long, String)]]()
    var cur = Vector.empty[(Long, Long, Long, String)]
    var curBytes = 0L
    for (rec <- live) {
      val sz = dirSize(rec._4)
      if (cur.nonEmpty && curBytes + sz > targetBytes) {
        if (cur.length >= 2) bins += cur
        cur = Vector.empty; curBytes = 0L
      }
      if (sz < targetBytes) { cur :+= rec; curBytes += sz }
      else { if (cur.length >= 2) bins += cur; cur = Vector.empty; curBytes = 0L }
    }
    if (cur.length >= 2) bins += cur
    bins.foreach { bin =>
      val (lo, hi) = (bin.map(_._1).min, bin.map(_._2).max)
      val n = bin.map(_._3).sum
      val outDir = s"$rollBase/compact_${lo}_${hi}_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.read.schema(mutationSchema)
        .option("recursiveFileLookup", "true").parquet(bin.map(_._4): _*)
        .repartition(1)
        .sortWithinPartitions("block", "order")
        .write.option("compression", "gzip").parquet(outDir)
      failpoint("compact:afterData")
      appendManifest(s"${manifestPath(db, coll)}/compact",
        Seq(Row(lo, hi, n, dirSize(outDir), outDir, bin.map(_._4))),
        compactManifestSchema)
      failpoint("compact:afterRecord")
      // retired dirs stay on disk until the next call's self-heal pass
      // (grace period for in-flight reader plans — see scaladoc)
    }
    bins.length
  }

  /** Recovery = re-reading state from rollups (+ any live tail); the fold
    * is identical because the log schema and ordering keys are preserved. */
  def recover(db: String, coll: String): DocCollection = collection(db, coll)

  // ---- node setup & status (db3_system.proto Setup / GetSystemStatus) -
  // The reference's admin surface: Setup is a SIGNED config write
  // (SystemConfig's rollup-policy knobs) whose sender becomes — and must
  // remain — the node admin; GetSystemStatus reads it back. The chain /
  // Arweave / EVM account fields have no Spark analog and are omitted;
  // the signed-write requirement and the admin pinning are kept.

  private def configPath = s"$root/state/config.json"

  /** Setup analog: `typedDataJson.message.payload` hex-encodes a JSON
    * object with any of minRollupSizeBytes / rollupIntervalMs /
    * minGcOffset / networkId, and `message.nonce` the sender's next
    * nonce; the sender is RECOVERED from the signature
    * (db3_system.proto:23 SetupRequest{signature, payload}). Admin
    * check: the constructor-pinned admin when set, else the stored admin
    * from the first successful setup (TOFU). The nonce rides the same
    * per-sender replay cell as `sendMutation` and is consumed ONLY by an
    * accepted setup — a captured admin-signed Setup cannot be replayed
    * later to revert the policy. Returns the admin address. */
  def setup(typedDataJson: String, sigHex: String): String = {
    import graft.functions.crypto.{Eip712, Keccak256}
    val recovered = Eip712.recoverAddressOrNull(typedDataJson, sigHex)
    if (recovered == null)
      throw new IllegalArgumentException("invalid signature or typed data")
    val sender = recovered.toString
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(typedDataJson)
    val msg = tree.get("message")
    if (msg == null || msg.get("payload") == null || msg.get("nonce") == null)
      throw new IllegalArgumentException("bad typed data: missing payload/nonce")
    val nonce = msg.get("nonce").asText.toLongOption.getOrElse(
      throw new IllegalArgumentException("bad typed data: non-numeric nonce"))
    val payload = Keccak256.fromHex(msg.get("payload").asText).getOrElse(
      throw new IllegalArgumentException("bad typed data: non-hex payload"))
    val req = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    def knob(name: String, dflt: Long): Long =
      Option(req.get(name)).map(_.asLong(dflt)).getOrElse(dflt)
    withNonceLock { // same cell-serialization discipline as the nonce cell
      systemStatus().adminAddr.foreach { admin =>
        if (normAddr(admin) != normAddr(sender))
          throw new IllegalArgumentException(s"setup rejected: $sender is not the admin")
      }
      // nonce check-and-consume AFTER the admin gate (a rejected
      // non-admin attempt burns nothing) and inside the SAME lock hold —
      // inlined because withNonceLock does not nest (the OS file lock is
      // JVM-scoped). Rejecting a stale nonce here is what makes a
      // replayed Setup dead on arrival.
      val key = normAddr(sender)
      val nonces = readNonces()
      val expected = nonces.getOrElse(key, 0L) + 1L
      if (nonce != expected)
        throw new IllegalArgumentException(
          s"bad setup nonce for $key: got $nonce, expected $expected")
      writeNonces(nonces.updated(key, nonce))
      // a crash here burns the nonce without applying the config — the
      // chain-standard failure mode: the config stays atomically at its
      // previous value, a REPLAY of the same signed request is dead on
      // arrival, and the client retries with the next nonce
      failpoint("setup:afterNonce")
      val prev = systemStatus().config
      val cfg = NodeConfig(
        minRollupSizeBytes = knob("minRollupSizeBytes", prev.minRollupSizeBytes),
        rollupIntervalMs = knob("rollupIntervalMs", prev.rollupIntervalMs),
        minGcOffset = knob("minGcOffset", prev.minGcOffset),
        networkId = knob("networkId", prev.networkId))
      val p = Paths.get(configPath)
      Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling("config.json.tmp")
      import org.json4s.jackson.Serialization
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      Files.writeString(tmp, Serialization.write(StoredConfig(sender, cfg)))
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    sender
  }

  /** The rollup executor's tick under the Setup'd policy
    * (rollup_executor.rs reads min_rollup_size from the admin config):
    * compact the tail only once it has outgrown the configured minimum.
    * Returns the records written, empty when not yet due. */
  def rollupIfDue(db: String, coll: String): Seq[RollupRecord] = {
    val recs =
      if (tailBytes(db, coll) >= systemStatus().config.minRollupSizeBytes)
        rollup(db, coll)
      else Seq.empty
    // OPTIMIZE rides the same tick: a drain that cut new batches may
    // have left sub-target dirs (every run's LAST batch is size-
    // truncated); compaction is a no-op when no adjacent pair fits a
    // bin, so the tick stays idempotent. Separate lock acquisitions —
    // withCollLock does not nest — which is safe: compaction only ever
    // touches manifest-listed dirs, never the tail a writer that
    // squeezed between the locks might be appending.
    if (recs.nonEmpty)
      compactRollups(db, coll, systemStatus().config.minRollupSizeBytes)
    recs
  }

  /** GetSystemStatus analog: admin, init flag and the config cell
    * (defaults before any setup). A constructor-pinned admin is reported
    * even before the first setup — it is fixed at boot, not learned. */
  def systemStatus(): SystemStatus = {
    val p = Paths.get(configPath)
    if (!Files.exists(p)) SystemStatus(hasInited = false, pinnedAdmin, NodeConfig())
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val st = JsonMethods.parse(Files.readString(p)).extract[StoredConfig]
      // a boot-time pin outranks the stored admin (the stored value only
      // matters on TOFU nodes)
      SystemStatus(hasInited = true, pinnedAdmin.orElse(Some(st.admin)), st.config)
    }
  }

  // ---- mutation-log inspection (the storage node's log RPCs) ----------
  // db3_storage.proto:191-202: GetMutationHeader / GetMutationBody are
  // point reads by mutation id, ScanMutationHeader pages the log, GetBlock
  // returns one block's mutations, GetMutationState aggregates the
  // MutationStateView counters. All are pushed-filter scans over the log
  // (the block predicate prunes row groups) or manifest reads — nothing
  // folds state.

  /** GetMutationHeader analog: one mutation's header plus its rollup
    * status (the proto's MutationRollupStatus: rolled-up vs live tail). */
  def getMutationHeader(db: String, coll: String, block: Long, order: Int)
      : Option[MutationHeaderView] = {
    val rolledTo = scanRollupRecords(db, coll)
      .agg(max(col("end_block"))).head() match {
        case r if r.isNullAt(0) => Long.MinValue
        case r => r.getLong(0)
      }
    mutationLog(db, coll)
      .filter(col("block") === block && col("order") === order)
      .select("block", "order", "action", "id").head(1).headOption
      .map(r => MutationHeaderView(r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), rolledUp = block <= rolledTo))
  }

  /** GetMutationBody analog: one mutation's payload (doc + mask). */
  def getMutationBody(db: String, coll: String, block: Long, order: Int)
      : Option[(String, Option[String])] =
    mutationLog(db, coll)
      .filter(col("block") === block && col("order") === order)
      .select("doc", "mask").head(1).headOption
      .map(r => (r.getString(0), Option(r.getString(1))))

  /** ScanMutationHeader analog: a (start, limit) page of headers in
    * (block, order) log order — sort+limit fuses to TakeOrderedAndProject
    * when start is 0. */
  def scanMutationHeaders(db: String, coll: String, start: Int, limit: Int): DataFrame = {
    val page = mutationLog(db, coll)
      .select("block", "order", "action", "id")
      .orderBy(col("block").asc, col("order").asc)
    (if (start > 0) page.offset(start) else page).limit(limit)
  }

  /** GetBlock analog: every mutation stamped in one block, in order. */
  def getBlock(db: String, coll: String, block: Long): DataFrame =
    mutationLog(db, coll).filter(col("block") === block)
      .orderBy(col("order").asc)

  /** GetMutationState analog: the MutationStateView counters
    * (db3_storage.proto:169-182) from one log aggregate + the rollup/gc
    * manifests. */
  def mutationState(db: String, coll: String): MutationStateView = {
    val logAgg = mutationLog(db, coll).agg(
      count(lit(1)).as("n"),
      coalesce(sum(coalesce(length(col("doc")).cast("long"), lit(0L)) +
        coalesce(length(col("mask")).cast("long"), lit(0L))), lit(0L)).as("bytes"),
      coalesce(max(col("block")), lit(-1L)).as("last_block")).head()
    val roll = scanRollupRecords(db, coll).agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("compressed_bytes")), lit(0L)),
      coalesce(sum(col("raw_bytes")), lit(0L)),
      coalesce(sum(col("mutation_count")), lit(0L))).head()
    val gc = scanGcRecords(db, coll).agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("mutation_count")), lit(0L))).head()
    MutationStateView(
      mutationCount = logAgg.getLong(0),
      totalMutationBytes = logAgg.getLong(1),
      lastBlock = logAgg.getLong(2),
      rollupCount = roll.getLong(0),
      totalRollupBytes = roll.getLong(1),
      totalRollupRawBytes = roll.getLong(2),
      totalRollupMutationCount = roll.getLong(3),
      gcCount = gc.getLong(0),
      totalGcMutationCount = gc.getLong(1))
  }

  /** Bulk-ingest documents from newline-delimited JSON files (the
    * reference SDK's addDoc over an external dump): each line becomes one
    * AddDocument mutation. Fully distributed — the lines never visit the
    * driver: ids are assigned densely by zipWithIndex over the
    * deterministic file/split ordering, every partition writes its own
    * parquet, and the driver only reserves the (block, id-base) range in
    * the state cell. (A single bulk block holds up to 2^31 lines — the
    * `order` column's width; ids are unbounded longs.) */
  def addDocumentsFromJson(db: String, coll: String, jsonPath: String): Long = {
    import spark.implicits._
    val lines = spark.read.textFile(jsonPath)
      .map(_.trim).filter((l: String) => l.nonEmpty)
    val n = lines.count()
    if (n == 0) return 0L
    // bulk-ingest is a (rare) admin op: the block/id range assignment AND
    // the distributed write serialize under the collection lock, so a
    // concurrent sequential writer can neither reuse the block nor
    // observe the batch before its state bump publishes it
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      val block = st.lastBlock + 1
      val base = st.nextId
      val rows = lines.rdd.zipWithIndex().map { case (doc, i) =>
        Row(block, i.toInt, ActionAdd, base + i, doc, null)
      }
      spark.createDataFrame(rows, mutationSchema)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${mutPath(db, coll)}/blk_${block}_${java.util.UUID.randomUUID.toString.take(8)}")
      writeState(db, coll, CollState(block, base + n))
    }
    n
  }

  /** Export live state (sink): parquet or ndjson of (_id, doc). */
  def `export`(db: String, coll: String, outPath: String, format: String = "parquet"): Unit = {
    val df = collection(db, coll).df
    format match {
      case "json" => df.write.mode(SaveMode.Overwrite).json(outPath)
      case _ => df.write.mode(SaveMode.Overwrite).parquet(outPath)
    }
  }

  /** Record one LIFECYCLE mutation in the log (CreateEventDB /
    * DeleteEventDB / Mint* / AddCollection / CreateDocumentDB /
    * AddIndex — db3_mutation_v2.proto:103-114): a bookkeeping row with
    * id = -1 that pages through `scanMutationHeaders`, counts in
    * `mutationState`, and rolls up with everything else, but NEVER
    * touches document state (the fold interprets only `DocActions`).
    * The Mint* actions are on-chain NFT ownership transfers in the
    * reference — here pure metadata, recorded for log completeness.
    * Returns the stamped block. */
  def recordLifecycleMutation(db: String, coll: String, action: Int,
      payload: String = null): Long = {
    require(!DocActions.contains(action),
      s"action $action is a document mutation; use add/update/deleteDocuments")
    withCollLock(db, coll) {
      val st = currentState(db, coll)
      sweepOrphanBatchDirs(db, coll, st.lastBlock)
      val block = st.lastBlock + 1
      append(db, coll, block, Seq(Row(block, 0, action, -1L, payload, null)))
      writeState(db, coll, st.copy(lastBlock = block))
      block
    }
  }

  /** CreateEventDB lifecycle record (db3_mutation_v2.proto:109): the
    * event-DB CAPABILITY (ABI decode, typed tables, TTL) lives in
    * graft.events; this records the lifecycle act in the collection's
    * log like the reference's mutation stream does. */
  def createEventDb(db: String, coll: String, configJson: String = null): Long =
    recordLifecycleMutation(db, coll, ActionCreateEventDB, configJson)

  /** DeleteEventDB lifecycle record (db3_mutation_v2.proto:114). */
  def deleteEventDb(db: String, coll: String): Long =
    recordLifecycleMutation(db, coll, ActionDeleteEventDB)

  /** AddIndexMutation analog: RECORD the index declaration in the
    * mutation log (AddIndex = 8) and materialize the typed key
    * extraction as a sorted parquet index table — on a cluster this is
    * the bucketed/sorted projection that replaces the reference's EJDB2
    * B-tree (row-group pruning on the sorted key). */
  def addIndex(db: String, coll: String, path: String, indexType: String): Unit = {
    recordLifecycleMutation(db, coll, ActionAddIndex,
      s"""{"path":"$path","type":"$indexType"}""")
    val idxDir = s"${collPath(db, coll)}/indexes/$path"
    // try_cast: an index build over schemaless docs must skip mismatched
    // values (they fall out via the isNotNull below), not abort the scan
    // under ANSI mode
    val keyCol = indexType match {
      case "Int64Key" => get_json_object(col("doc"), "$." + path).try_cast("long")
      case "DoubleKey" => get_json_object(col("doc"), "$." + path).try_cast("double")
      case _ => get_json_object(col("doc"), "$." + path)
    }
    collection(db, coll).df
      .select(keyCol.as("idx_key"), col("_id"))
      .filter(col("idx_key").isNotNull)
      .sort("idx_key")
      .write.mode(SaveMode.Overwrite).parquet(idxDir)
  }

  /** Read a materialized index (idx_key, _id). */
  def index(db: String, coll: String, path: String): DataFrame =
    spark.read.parquet(s"${collPath(db, coll)}/indexes/$path")

  def hasIndex(db: String, coll: String, path: String): Boolean =
    new java.io.File(s"${collPath(db, coll)}/indexes/$path").isDirectory

  /** Index-aware execution: when the query's leading field filter has a
    * materialized index, evaluate the predicate against the index scan
    * (sorted parquet — min/max row-group pruning on idx_key, tiny
    * ReadSchema), then fetch the surviving `_id`s: a selective lookup
    * In-pushes the id set into the log scan (block skip via row-group
    * stats, O(matching blocks) read — `collectionForIds`), an
    * unselective one left-semi joins distributed; remaining
    * filters/projection run as usual. Falls back to the plain fused
    * compiler when no index applies — the reference's planner does
    * exactly this over its EJDB index set
    * (doc_store.rs add_index / execute_query). */
  def queryWithIndex(db: String, coll: String, q: StructuredQuery): DataFrame = {
    import graft.docstore._
    // only scalar comparisons use the sorted index; membership/array ops
    // (and OR trees) fall back to the fused compiler
    def indexable(op: Op) = op match {
      // scalar comparisons walk the sorted index; membership/array/regex
      // ops fall back (array-contains-any and regex can never id-push —
      // the index holds scalar keys, not array elements or raw text)
      case Op.Eq | Op.Neq | Op.Lt | Op.Le | Op.Gt | Op.Ge => true
      case _ => false
    }
    val (indexed, rest) = q.where match {
      case Some(ff @ FieldFilter(f, op, _)) if indexable(op) && hasIndex(db, coll, f) =>
        (Some(ff), None)
      case Some(AndFilter(fs)) =>
        val (i, r) = fs.partition {
          case FieldFilter(f, op, _) => indexable(op) && hasIndex(db, coll, f)
          case _ => false
        }
        i.headOption.map(_.asInstanceOf[FieldFilter]) match {
          case Some(ff) =>
            val remaining = (i.drop(1) ++ r)
            (Some(ff), if (remaining.isEmpty) None else Some(AndFilter(remaining)))
          case None => (None, q.where)
        }
      case other => (None, other)
    }
    def scalarLit(v: FieldValue): Column = v match {
      case FieldValue.I64(x) => lit(x)
      case FieldValue.Dbl(x) => lit(x)
      case FieldValue.Bool(x) => lit(x)
      case FieldValue.Str(x) => lit(x)
      case FieldValue.Arr(_) =>
        throw new IllegalStateException("array operand is never indexable")
    }
    // KEYSET-CURSOR range for the index scan: a cursor on the LEADING
    // order key narrows the index exactly like a range filter — the
    // O(page) pagination story against the index. Only the
    // null-REJECTING side can narrow (the index drops null keys, and
    // the other side's tuple-compare ADMITS null keys, which sort
    // before/after everything): ascending head key ⇒ startAt implies
    // idx_key >= v; descending ⇒ endAt implies idx_key >= v. Both
    // derivable sides are relaxations — the full tuple-compare still
    // runs in the fused compiler over the narrowed rows, so this is
    // purely a scan reduction, never a semantics change.
    // ... and only when the cursor value, the order witness and the
    // index key all agree on ONE type: an Int64 index narrows
    // numerically while a string-witnessed ordering compares
    // lexicographically ("10" < "9"), so a type-crossed bound would
    // drop rows the query admits.
    def sparkTypeOf(v: FieldValue): org.apache.spark.sql.types.DataType = v match {
      case FieldValue.I64(_) => org.apache.spark.sql.types.LongType
      case FieldValue.Dbl(_) => org.apache.spark.sql.types.DoubleType
      case FieldValue.Bool(_) => org.apache.spark.sql.types.BooleanType
      case FieldValue.Str(_) => org.apache.spark.sql.types.StringType
      case FieldValue.Arr(_) => org.apache.spark.sql.types.NullType
    }
    val cursorBound: Option[(String, FieldValue)] =
      q.orderBy.headOption.flatMap { o =>
        val side = if (o.desc) q.endAt else q.startAt
        side.flatMap(_.values.headOption.flatten) match {
          case Some(v) if !v.isInstanceOf[FieldValue.Arr] &&
              v.getClass == o.keyType.getClass &&
              hasIndex(db, coll, o.field) &&
              index(db, coll, o.field).schema.find(_.name == "idx_key")
                .exists(_.dataType == sparkTypeOf(v)) =>
            Some((o.field, v))
          case _ => None
        }
      }
    if (indexed.isEmpty && cursorBound.isEmpty)
      return DocStore.queryFused(collection(db, coll), q)
    val key = col("idx_key")
    // pick the scan: the where-filter's index wins; the cursor bound
    // ANDs in when it binds the same field, else it serves alone
    val (f, pred) = indexed match {
      case Some(FieldFilter(f0, op, v)) =>
        val lit0 = scalarLit(v)
        val base = op match {
          case Op.Eq => key === lit0
          case Op.Neq => key =!= lit0
          case Op.Lt => key < lit0
          case Op.Le => key <= lit0
          case Op.Gt => key > lit0
          case Op.Ge => key >= lit0
          // membership/array/regex ops are filtered out by indexable() above
          case _ => lit(true)
        }
        cursorBound match {
          case Some((cf, cv)) if cf == f0 => (f0, base && key >= scalarLit(cv))
          case _ => (f0, base)
        }
      case None =>
        val (cf, cv) = cursorBound.get
        (cf, key >= scalarLit(cv))
    }
    val ids = index(db, coll, f).filter(pred).select(col("_id"))
    // Selective lookups (the indexed-Eq hot path) collect the small
    // surviving id set and PUSH it into the log scan via
    // collectionForIds — the parquet reader then skips every block
    // whose id range excludes the set, so the lookup reads
    // O(matching blocks), not the whole log. Unselective predicates
    // keep the distributed left-semi join (never a big driver
    // collect).
    val probe = ids.limit(MaxPushedIds + 1).collect()
    val narrowed =
      if (probe.length <= MaxPushedIds)
        collectionForIds(db, coll, probe.map(_.getLong(0)).toSeq).df
      else collection(db, coll).df
        .join(ids, Seq("_id"), "left_semi")
    DocStore.queryFused(DocCollection(coll, narrowed), q.copy(where = rest))
  }

  /** Max index-lookup ids pushed as an In filter into the log scan;
    * beyond this the distributed semi-join path takes over. */
  private val MaxPushedIds = 1024

  /** Metadata listings (db_store_v2.rs get_database_of_owner /
    * get_collection_of_database). The node-level `state/` dir (nonce +
    * config cells) is reserved, not a database. */
  def listDatabases(): Seq[String] = listDirs(root).filterNot(_ == "state")

  def listCollections(db: String): Seq[String] = listDirs(s"$root/$db")

  /** GetContractSyncStatus analog (db3_indexer.proto:43
    * ContractSyncStatus{addr, block_number, event_number}): the
    * indexer's per-contract sync progress maps to per-collection ingest
    * progress — last stamped block and mutation count. State-cell +
    * manifest reads; the count is one aggregate over the log. */
  def syncStatus(): Seq[SyncStatusView] =
    for (db <- listDatabases(); coll <- listCollections(db)) yield
      SyncStatusView(db, coll, currentState(db, coll).lastBlock,
        mutationLog(db, coll).count())

  /** CollectionState.total_doc_count analog. */
  def collectionState(db: String, coll: String): Long =
    collection(db, coll).df.count()

  private def listDirs(p: String): Seq[String] = {
    val d = new java.io.File(p)
    if (!d.isDirectory || d.listFiles() == null) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }
}

object GraftDB {
  /** JVM-wide monitor per nonce cell path: OS file locks are held on
    * behalf of the whole JVM, so same-JVM GraftDB instances must
    * serialize BEFORE taking the cross-process FileChannel lock (a
    * second same-JVM lock() would throw OverlappingFileLockException,
    * not block). */
  private[api] val nonceMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** JVM-wide monitor per collection state cell (see nonceMonitors). */
  private[api] val collMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // the FULL MutationAction enum (db3_mutation_v2.proto:103-114)
  val ActionCreateDocumentDB = 0
  val ActionAddCollection = 1
  val ActionAdd = 2 // MutationAction.AddDocument
  val ActionDelete = 3 // MutationAction.DeleteDocument
  val ActionUpdate = 4 // MutationAction.UpdateDocument
  val ActionCreateEventDB = 5
  val ActionMintDocumentDB = 6 // on-chain NFT transfer: metadata-only here
  val ActionMintCollection = 7 // on-chain NFT transfer: metadata-only here
  val ActionAddIndex = 8
  val ActionDeleteEventDB = 9

  /** The three actions the document fold interprets; every other enum
    * value is lifecycle bookkeeping that rides the log untouched. */
  val DocActions: Set[Int] = Set(ActionAdd, ActionDelete, ActionUpdate)

  case class MutationRow(block: Long, order: Int, action: Int,
      id: Long, doc: String, mask: String)

  /** RollupRecord analog (rollup_executor.rs RollupRecord{start_block,
    * end_block, mutation_count, raw_data_size, compress_data_size,
    * arweave_tx → path}). */
  case class RollupRecord(startBlock: Long, endBlock: Long,
      mutationCount: Long, compressedBytes: Long,
      rawBytes: Long = 0L, path: String = "")

  /** The per-collection block-state cell (mutation_store.rs:444):
    * last stamped block + next dense doc id. */
  case class CollState(lastBlock: Long, nextId: Long)

  /** GetMutationHeader view: header fields + rollup status. */
  case class MutationHeaderView(block: Long, order: Int, action: Int,
      id: Long, rolledUp: Boolean)

  /** GetMutationState view (db3_storage.proto:169-182 MutationStateView;
    * the Arweave/EVM cost fields have no Spark analog and are omitted). */
  case class MutationStateView(mutationCount: Long, totalMutationBytes: Long,
      lastBlock: Long, rollupCount: Long, totalRollupBytes: Long,
      totalRollupRawBytes: Long, totalRollupMutationCount: Long,
      gcCount: Long, totalGcMutationCount: Long)

  /** SystemConfig's rollup-policy knobs (db3_base.proto:22-33; chain and
    * node-url fields omitted — no Spark analog). */
  case class NodeConfig(minRollupSizeBytes: Long = 64L * 1024 * 1024,
      rollupIntervalMs: Long = 60000L, minGcOffset: Long = 0L,
      networkId: Long = 0L)

  private[api] case class StoredConfig(admin: String, config: NodeConfig)

  /** GetSystemStatus view (db3_base.proto:41 SystemStatus). */
  case class SystemStatus(hasInited: Boolean, adminAddr: Option[String],
      config: NodeConfig, versionLabel: String = "graft-spark")

  /** GetContractSyncStatus view (db3_indexer.proto:43). */
  case class SyncStatusView(db: String, collection: String,
      lastBlock: Long, mutationCount: Long)

  /** Doc-id stride for block-encoded ids from partition-parallel appends
    * (id = block·2^31 + order, the DocumentEntryId composition). */
  val IdStride: Long = 1L << 31

  /** SDK-side signed-request builder (the wrapTypedRequest +
    * signTypedData pair of sdk/src/provider/storage_provider_v2.ts):
    * wraps NDJSON docs + nonce in the mutation TypedData shape
    * (Message(bytes payload, string nonce), empty domain) and signs with
    * private scalar `key`. Returns (typedDataJson, signatureHex) — the
    * exact arguments `sendMutation` verifies. */
  def signedMutationRequest(docs: Seq[String], nonce: Long, key: Long): (String, String) = {
    import graft.functions.crypto.{Eip712, Keccak256}
    val payloadHex = Keccak256.hexLower(
      docs.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val typedData =
      s"""{"types":{"EIP712Domain":[],"Message":[{"name":"payload","type":"bytes"},{"name":"nonce","type":"string"}]},"domain":{},"primaryType":"Message","message":{"payload":"0x$payloadHex","nonce":"$nonce"}}"""
    val sig = Eip712.signOrNull(typedData, key)
    require(sig != null, "signing failed")
    (typedData, sig.toString)
  }

  val rollupManifestSchema: StructType = StructType(Seq(
    StructField("start_block", LongType, nullable = false),
    StructField("end_block", LongType, nullable = false),
    StructField("mutation_count", LongType, nullable = false),
    StructField("compressed_bytes", LongType, nullable = false),
    StructField("raw_bytes", LongType, nullable = false),
    StructField("path", StringType, nullable = false)))

  /** Snapshot manifest: folded-state checkpoints (block, n_docs, path). */
  val snapshotManifestSchema: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("n_docs", LongType, nullable = false),
    StructField("path", StringType, nullable = false)))

  val gcManifestSchema: StructType = StructType(Seq(
    StructField("start_block", LongType, nullable = false),
    StructField("end_block", LongType, nullable = false),
    StructField("mutation_count", LongType, nullable = false)))

  /** Rollup-compaction manifest: one row per compacted bin — the new
    * dir plus the batch dirs it retires (the OPTIMIZE commit point). */
  val compactManifestSchema: StructType = StructType(Seq(
    StructField("start_block", LongType, nullable = false),
    StructField("end_block", LongType, nullable = false),
    StructField("mutation_count", LongType, nullable = false),
    StructField("compressed_bytes", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("replaced", ArrayType(StringType), nullable = false)))

  val mutationSchema: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("order", IntegerType, nullable = false),
    StructField("action", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = true),
    StructField("mask", StringType, nullable = true)))

  /** DocumentMask merge on JSON docs (db3_mutation_v2.proto DocumentMask):
    * masked fields copied from patch (deleted if absent there); null mask
    * = full replace. */
  private[api] def mergeMasked(base: String, patch: String, mask: Option[String]): String = {
    mask match {
      case None => patch
      case Some(m) =>
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val baseObj = JsonMethods.parse(base).asInstanceOf[JObject]
        val patchObj = JsonMethods.parse(patch) match {
          case o: JObject => o
          case _ => JObject()
        }
        val fields = m.split(",").map(_.trim).filter(_.nonEmpty)
        val merged = fields.foldLeft(baseObj) { (acc, f) =>
          patchObj \ f match {
            case JNothing => JObject(acc.obj.filterNot(_._1 == f))
            case v => JObject(acc.obj.filterNot(_._1 == f) :+ (f -> v))
          }
        }
        JsonMethods.compact(JsonMethods.render(merged))
    }
  }

  private def hasParquet(dir: String): Boolean = {
    val d = new java.io.File(dir)
    if (!d.isDirectory || d.listFiles() == null) false
    else d.listFiles().exists(f =>
      f.getName.endsWith(".parquet") || (f.isDirectory && hasParquet(f.getPath)))
  }

  // recursive: mutation tails nest per-block subdirs (appendDocumentsAt)
  private def dirSize(dir: String): Long = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) 0L
    else d.listFiles().map(f =>
      if (f.isFile) f.length() else dirSize(f.getPath)).sum
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
