package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a batched decode/feature-extract
  * stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic FAKE (`fakeDecode`): payloads are
  * synthesized from the document text (64 md5-derived bytes) and
  * "decoding" computes byte statistics. Everything around the stub is
  * real and tested: the binary+metadata schema, the partition-parallel
  * batched UDF shape (`mapPartitions` over fixed-size batches — the
  * Scala analogue of an Arrow-batched pandas UDF), and the
  * partitioning/pushdown behavior of the surrounding plan.
  *
  * Scale notes: media payloads dominate row width at 100 TB, so the
  * media table keeps payloads in their own column (parquet column
  * pruning skips them unless projected — m1 projects only the digest),
  * and the decode stage is map-only: no shuffle, one pass, arbitrary
  * parallelism.
  */
object MultimodalOps {

  private val PayloadRepeats = 4 // 4 × 16 md5 bytes = 64-byte payload

  /** The media table: doc_id + opaque payload + typed metadata struct.
    * (In production this is `spark.read.format("binaryFile")` or a
    * parquet table with a binary column; here payloads are synthesized
    * deterministically from `documents.text`.) */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      unhex(repeat(md5(col("text")), PayloadRepeats)).as("payload"),
      struct(
        lit("image").as("media_type"),
        lit(8).as("width"),
        lit(8).as("height"),
        length(col("text")).cast("long").as("source_bytes")).as("meta"))

  /** m1: schema/digest view — metadata columns + payload length + md5
    * digest (the payload itself stays unprojected downstream, proving
    * column pruning keeps the heavy bytes out of the scan when only
    * metadata is needed). */
  def mediaSchema(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).cast("long").as("n_bytes"),
      // digest over the hex encoding (DuckDB md5 takes VARCHAR only)
      md5(lower(hex(col("payload")))).as("payload_md5"))
      .orderBy(col("doc_id"))

  /** The FAKE decode: byte statistics standing in for pixel decode.
    * Deterministic, pure, and exercised by unit tests. */
  private[queries] def fakeDecode(payload: Array[Byte]): (Double, Long) = {
    val unsigned = payload.map(b => (b & 0xff).toLong)
    val mean = unsigned.sum.toDouble / unsigned.length
    val thumb = unsigned.take(4).sum // "2x2 thumbnail" checksum
    (math.rint(mean * 1e6) / 1e6, thumb)
  }

  private val BatchSize = 64

  /** m2: batched decode/feature-extract over partitions — the
    * `mapInPandas` batch shape in Scala: fixed-size batches inside each
    * partition, one output row per media row, no shuffle. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map {
        case (id, payload) =>
          val (mean, thumb) = fakeDecode(payload)
          (id, mean, thumb, payload.length.toLong)
      }))
      .toDF("doc_id", "byte_mean", "thumb_sum", "n_bytes")
    out.orderBy(col("doc_id"))
  }

  /** m3: batched "resize" — 2x2 average-pool of the 8x8 byte grid down
    * to 4x4 (the deterministic stand-in for an image resize kernel),
    * long format: one row per output pixel. Same batched mapPartitions
    * shape as m2 (an opaque image library call in production); map-only,
    * no shuffle, and — unlike m2 — integer/byte arithmetic, so the gate
    * holds an exact DuckDB oracle over the hex encoding. */
  def mediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap {
        case (id, p) =>
          def b(i: Int): Long = (p(i) & 0xff).toLong
          for (y <- 0 until 4; x <- 0 until 4) yield {
            val (r, c) = (2 * y, 2 * x)
            val v = (b(r * 8 + c) + b(r * 8 + c + 1) +
              b((r + 1) * 8 + c) + b((r + 1) * 8 + c + 1)) / 4
            (id, x.toLong, y.toLong, v)
          }
      }))
      .toDF("doc_id", "x", "y", "v")
      .orderBy(col("doc_id"), col("y"), col("x"))
  }

  private[queries] val FrameBytes = 4
  private[queries] val FrameStride = 4

  /** m4: temporal frame sampling — the payload read as a 16-frame
    * "video" (4 bytes/frame), keeping every 4th frame; one output row
    * per sampled frame with a per-frame digest. The one→many batched
    * UDF shape of a video pipeline (decode container → sample frames →
    * per-frame features) with a deterministic fake decode; map-only. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(BatchSize).flatMap(_.flatMap { case (id, p) =>
          (0 until p.length / FrameBytes by FrameStride).map { f =>
            val frame = p.slice(f * FrameBytes, (f + 1) * FrameBytes)
            // digest over the hex encoding (DuckDB md5 takes VARCHAR)
            val hex = frame.map("%02x".format(_)).mkString
            val digest = md.digest(hex.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            (id, f.toLong, frame.map(b => (b & 0xff).toLong).sum, digest)
          }
        })
      }
      .toDF("doc_id", "frame_idx", "frame_sum", "frame_md5")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** m7: cross-video FRAME dedup — the frame-level pass video
    * pipelines run after m4's sampling: intro/outro cards and shared
    * stock footage recur across files, and per-frame digests group
    * them exactly (t2's shape on the frame table: one digest-keyed,
    * map-side-combinable aggregation — no join, no window). Emits
    * the digests occurring more than once with occurrence/file
    * counts and the canonical (lowest) doc. */
  def frameDedup(s: SparkSession, dir: String): DataFrame =
    frameSample(s, dir)
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_frames") > 1)
      .orderBy(col("frame_md5"))

  /** m5: perceptual-hash media dedup — the image-dedup pass a
    * multimodal pipeline runs before training: a 64-bit average-hash
    * (bit i set iff pixel i is above the image mean, computed
    * division-free as `p*64 > sum`) keys each payload, then one
    * shuffle on the hash groups duplicate media and keeps the lowest
    * doc id per group (t2's exact-dedup shape on a perceptual key).
    * The hash runs in m2's batched map-only decode stage; with a real
    * decoder the identical plan runs on true pixels, and Hamming-ball
    * near-dup (rotated/re-encoded images) composes by feeding these
    * hashes through t8's pigeonhole block join instead of the
    * equi-join. */
  /** The 64-bit average-hash stage shared by m5 (equi-join dedup) and
    * m6 (hamming-ball clusters) — map-only in m2's batched decode
    * shape. */
  private[queries] def mediaAhash(s: SparkSession, dir: String): DataFrame =
    mediaAhashOf(mediaTable(s, dir).select(col("doc_id"), col("payload")))

  /** [[mediaAhash]] over an arbitrary `(doc_id, payload)` relation —
    * shared by the full-corpus hash stage and m8's delta-only probe
    * (where the tranche filter sits BEFORE this map-only stage, so it
    * pushes to the scan). */
  private[queries] def mediaAhashOf(in: DataFrame): DataFrame = {
    val s = in.sparkSession
    import s.implicits._
    in.as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, p) =>
        val u = p.map(b => (b & 0xff).toLong)
        val total = u.sum
        var hash = 0L
        var i = 0
        while (i < 64) { if (u(i) * 64L > total) hash |= 1L << i; i += 1 }
        (id, hash)
      }))
      .toDF("doc_id", "ahash")
  }

  /** Where the persisted MEDIA-HASH index for `dir`'s base tranche
    * lives (the t34 idiom on the multimodal family). */
  private[graft] def mediaIndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_index",
      s"mediaindex:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  /** BUILD the media-hash index: the BASE tranche's perceptual hashes
    * pre-aggregated to one `(ahash, canon)` row per distinct hash
    * (canon = min doc id — m5's keeper rule as servable state) plus
    * the `_CUT` watermark. Nonce-marker idempotent (the v17
    * contract). */
  private[graft] def buildMediaIndex(s: SparkSession, dir: String): String =
    buildMediaIndexAt(s, dir, mediaIndexPath(s, dir))

  private def buildMediaIndexAt(s: SparkSession, dir: String,
      out: java.nio.file.Path): String = {
    DedupOps.ensureArtifact(out) {
      val media = mediaTable(s, dir)
      val Array(lo, hi) = media.agg(min(col("doc_id")), max(col("doc_id")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val cut = (lo + hi) / 2
      mediaAhashOf(media.filter(col("doc_id") <= cut)
          .select(col("doc_id"), col("payload")))
        .groupBy(col("ahash"))
        .agg(min(col("doc_id")).as("canon"))
        .write.mode("overwrite").parquet(out.resolve("buckets").toString)
      java.nio.file.Files.write(out.resolve("_CUT"),
        cut.toString.getBytes("UTF-8"))
    }
  }

  /** m8: INCREMENTAL media dedup — a NEW batch of media probed against
    * the persisted corpus hash index (t34's daily-operations shape on
    * the multimodal family, completing the absorb-the-delta story
    * across all four: q33 relational, t34/s14 text, v20 vectors, m8
    * media). The delta (ids above `_CUT`, filter pushed to the scan)
    * hashes map-only through the batched decode stage, then probes the
    * bucket-cardinality `(ahash, canon)` relation with ONE keyed
    * equi-join — exact perceptual-hash equality, the m5 rule against
    * persisted state; cost is linear in the batch regardless of corpus
    * size. Near-miss (hamming ≤ 3) probing is m6's pigeonhole over the
    * same artifact — deliberately out of this gate. */
  def mediaIndexProbe(s: SparkSession, dir: String): DataFrame = {
    val idx = buildMediaIndex(s, dir)
    val cut = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "_CUT")), "UTF-8").trim.toLong
    val delta = mediaTable(s, dir).filter(col("doc_id") > cut)
      .select(col("doc_id"), col("payload"))
    mediaAhashOf(delta)
      .join(DedupOps.readStable(s, s"$idx/buckets"), Seq("ahash"))
      .select(col("doc_id"), col("ahash"), col("canon").as("dup_of"))
      .orderBy(col("doc_id"))
  }

  // ------------------------- m9: media-index WRITE-BACK (t35's idiom)

  /** The READ-WRITE media index — m8/its gate probe a read-only
    * artifact (the delta must stay un-absorbed there); the write-back
    * family maintains its own copy, exactly as t35 does beside t34. */
  private[graft] def rwMediaIndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_index_rw",
      s"mediaindexrw:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  private[graft] def buildRwMediaIndex(s: SparkSession, dir: String): String =
    buildMediaIndexAt(s, dir, rwMediaIndexPath(s, dir))

  /** APPEND the media tranche `(_CUT, upTo]` into the rw media index
    * and advance `_CUT` — t35's write-back on the multimodal family:
    * the delta's `(ahash, canon)` buckets land as new part files
    * (O(batch); the base relation is never rewritten) through the
    * shared [[DedupOps.commitArtifactAppend]] mechanics (marker
    * removed across the mutation window — crash ⇒ rebuild), and the
    * serve path min-merges on read: canon = min doc id is
    * merge-associative, so append ≡ rebuild exactly. Idempotent: an
    * absorbed tranche yields an empty delta and no-ops. */
  private[graft] def appendMediaIndex(s: SparkSession, dir: String,
      upTo: Long = Long.MaxValue): Long =
    appendMediaIndexAt(s, dir, rwMediaIndexPath(s, dir), upTo)

  private[graft] def appendMediaIndexAt(s: SparkSession, dir: String,
      out: java.nio.file.Path, upTo: Long): Long = {
    DedupOps.artifactLock(out).synchronized { DedupOps.retryOnConflict() {
      val cut = DedupOps.cutOf(out)
      val delta = mediaTable(s, dir)
        .filter(col("doc_id") > cut && col("doc_id") <= upTo)
        .select(col("doc_id"), col("payload"))
      val hiRow = delta.agg(max(col("doc_id"))).head()
      if (hiRow.isNullAt(0)) cut
      else {
        val newCut = hiRow.getLong(0)
        val tmp = out.resolve("buckets_append")
        mediaAhashOf(delta)
          .groupBy(col("ahash"))
          .agg(min(col("doc_id")).as("canon"))
          .write.mode("overwrite").parquet(tmp.toString)
        DedupOps.commitArtifactAppend(out, tmp, newCut, expectedCut = cut)
        newCut
      }
    } }
  }

  /** m9: media-index write-back, served — build the base hash index,
    * absorb the delta INTO it, serve the merged `(ahash, canon)`
    * relation. Oracle = the from-scratch rebuild over the full corpus
    * (append must be invisible in the result). With t35 (band index)
    * this makes BOTH persisted-probe families living indexes: day N's
    * batch probes an artifact that already absorbed days 1..N−1. */
  def mediaIndexAppendServe(s: SparkSession, dir: String): DataFrame = {
    buildRwMediaIndex(s, dir)
    appendMediaIndex(s, dir)
    DedupOps.readStable(s, rwMediaIndexPath(s, dir).resolve("buckets").toString)
      .groupBy(col("ahash"))
      .agg(min(col("canon")).as("canon"))
      .orderBy(col("ahash"))
  }

  // ---------------- m10: media-index COMPACTION (t36's fold here)

  /** m10's OWN artifact copy (m8 read-only / m9 rw / m10 compacted —
    * the gates stay order-independent by never sharing a mutable
    * artifact, t36's rule). */
  private[graft] def m10IndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_index_m10",
      s"mediaindexm10:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  /** m10: COMPACT the living media index — build the base, absorb the
    * delta (two `(ahash, canon)` generations on disk, the m9 state),
    * then fold them into one fresh generation and drop the `append-*`
    * files via [[DedupOps.compactArtifact]] (min per hash — the same
    * merge the serve path applies on read, materialized once). With
    * t36 (band index) and q37/q38 (partials), every append family now
    * has its compaction path. Gated by m9's oracle UNCHANGED;
    * serve-before ≡ serve-after and the generation drop pinned in
    * PartialsCompactSpec. */
  def mediaIndexCompactServe(s: SparkSession, dir: String): DataFrame = {
    val out = m10IndexPath(s, dir)
    buildMediaIndexAt(s, dir, out)
    appendMediaIndexAt(s, dir, out, Long.MaxValue)
    DedupOps.compactArtifact(s, out)(
      _.groupBy(col("ahash")).agg(min(col("canon")).as("canon")))
    DedupOps.readStable(s, DedupOps.requireReady(out).resolve("buckets").toString)
      .groupBy(col("ahash"))
      .agg(min(col("canon")).as("canon"))
      .orderBy(col("ahash"))
  }

  // ---------------- m11: media-index DELETION (t37's tombstones here)

  /** Where m11's MEMBERSHIP media-hash index lives. Like the band
    * index (t37), the folded `(ahash, canon)` relation m8/m9/m10
    * serve is not invertible — a takedown of a canon would leave it
    * pointing at a ghost, and re-deriving the next-min needs the
    * payload bytes an erasure request means you no longer hold. The
    * deletable media index persists membership `(ahash, doc_id)`
    * unfolded instead; for the mostly-singleton hash distribution the
    * row count is nearly the folded relation's — only duplicated
    * payloads add rows (the invertibility premium, measured for the
    * band family in BASELINE.md). */
  private[graft] def m11IndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_members_m11",
      s"mediamembers:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  /** BUILD the media membership artifact: every doc's perceptual
    * hash, unfolded — one `(ahash, doc_id)` row per doc, the relation
    * every later takedown anti-joins against. Nonce-marker
    * idempotent. */
  private[graft] def buildMediaMembers(s: SparkSession, dir: String): String = {
    val out = m11IndexPath(s, dir)
    DedupOps.ensureArtifact(out) {
      mediaAhashOf(mediaTable(s, dir)
          .select(col("doc_id"), col("payload")))
        .select(col("ahash"), col("doc_id"))
        .write.mode("overwrite").parquet(out.resolve("members").toString)
    }
  }

  /** m11's deterministic takedown list (production receives it from
    * outside): every canon of a multi-member hash bucket — the worst
    * case, each forcing a re-election. Index-only; the corpus and the
    * payload bytes are never touched. */
  private def m11TakedownSet(members: DataFrame): DataFrame =
    members.groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id")).distinct()

  /** The tombstone-aware media serve: surviving membership, min fold
    * — re-election IS the fold (t37's rule on the hash shelf). */
  private[graft] def mediaTombstoneServed(s: SparkSession, dir: String)
      : DataFrame =
    DedupOps.aliveMembers(s, DedupOps.requireReady(m11IndexPath(s, dir)))
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("canon"))

  /** m11: DELETION from the media index — build the membership
    * artifact, apply the deterministic takedown through the SHARED
    * [[DedupOps.applyTakedown]] mechanics (O(deleted) tombstone
    * write, `_TAKEDOWN` once-per-artifact, marker-last), serve the
    * re-elected `(ahash, canon)` relation. Oracle = the rebuild over
    * corpus-minus-deleted: dropping a doc's membership row is exactly
    * what re-hashing the corpus without it would produce (the decode
    * is per-doc). [[DedupOps.compactTombstoneIndex]] folds the
    * tombstones in; re-election + compaction pinned in
    * TombstoneSpec. */
  def mediaTombstoneReelect(s: SparkSession, dir: String): DataFrame = {
    stageMediaTombstones(s, dir)
    mediaTombstoneServed(s, dir).orderBy(col("ahash"))
  }

  /** m11's maintenance path alone (build + takedown), exposed for the
    * bench pre-stager: the timed reps measure the tombstone-aware
    * serve. */
  private[graft] def stageMediaTombstones(s: SparkSession, dir: String): Unit = {
    buildMediaMembers(s, dir)
    DedupOps.applyTakedown(s, m11IndexPath(s, dir))(m11TakedownSet)
  }

  // ---------------- m14: EXTERNAL takedown list on the media shelf
  // (t39's input-relation shape — m11 derives its list index-side for
  // fixture reproducibility; production's erasures arrive from a
  // legal-hold queue as a staged relation)

  private[graft] def m14IndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_members_m14",
      s"mediamembersm14:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  /** m14: the staged t39 erasure relation (corpus-range multiples of
    * 7, plus an absent id that must no-op and a repeated id that must
    * be idempotent — the same staged list the band/cluster shelves
    * erase, because an erasure request names DOCUMENTS, not shelves:
    * one list fans out to every index holding the doc's derived
    * state) applied to the media membership through the SHARED
    * [[DedupOps.applyTakedown]], re-elected canons served. The
    * payload bytes are never touched — the membership rows carry the
    * hash, which is the point: honoring the erasure needs no decode.
    * Oracle = the re-hash over docs not divisible by 7. */
  def mediaTakedownExternal(s: SparkSession, dir: String): DataFrame = {
    stageMediaTakedownExternal(s, dir)
    DedupOps.aliveMembers(s, DedupOps.requireReady(m14IndexPath(s, dir)))
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("canon"))
      .orderBy(col("ahash"))
  }

  /** m14's maintenance path alone (members copy + external-list
    * takedown), exposed for the bench pre-stager. */
  private[graft] def stageMediaTakedownExternal(s: SparkSession,
      dir: String, tag: String = null): Unit = {
    val out = m14IndexPath(s, dir)
    DedupOps.ensureArtifact(out) {
      mediaAhashOf(mediaTable(s, dir)
          .select(col("doc_id"), col("payload")))
        .select(col("ahash"), col("doc_id"))
        .write.mode("overwrite").parquet(out.resolve("members").toString)
    }
    val ext = DedupOps.stageT39Erasures(s, dir)
    DedupOps.applyTakedownExternal(s, out,
      DedupOps.readStable(s, ext.resolve("erasures").toString), tag = tag)
  }

  /** m12's OWN membership copy (m11 holds the canon-takedown's
    * tombstones; gates never share a mutable artifact). `_HORIZONS`
    * persists the fixture's two retention cutoffs at build time —
    * t38's rule: the steady-state serve never re-scans the corpus for
    * bounds; in production the horizon is the retention policy's
    * input. */
  private[graft] def m12IndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_members_m12",
      s"mediamembersm12:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  private[graft] def buildMediaAgeOffIndex(s: SparkSession, dir: String)
      : java.nio.file.Path = {
    val out = m12IndexPath(s, dir)
    DedupOps.ensureArtifact(out) {
      val m = mediaTable(s, dir)
      // one-time bounds read, confined to the build
      val Array(lo, hi) = m.agg(min(col("doc_id")), max(col("doc_id")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      mediaAhashOf(m.select(col("doc_id"), col("payload")))
        .select(col("ahash"), col("doc_id"))
        .write.mode("overwrite").parquet(out.resolve("members").toString)
      java.nio.file.Files.write(out.resolve("_HORIZONS"),
        s"${lo + (hi - lo) / 5} ${lo + (hi - lo) * 2 / 5}"
          .getBytes("UTF-8"))
    }
    out
  }

  /** m12: retention/TTL age-off on the MEDIA shelf — the policy verb
    * is shelf-agnostic by construction: [[DedupOps.ageOffMembers]]
    * filters the membership relation on `doc_id` alone, so the
    * identical horizon-generation mechanics (per-horizon
    * `delete-h<horizon>-*` tombstones + `_TAKEDOWN_<horizon>`
    * markers, one compaction folding any number of them) apply to the
    * `(ahash, doc_id)` members unchanged — no media-specific deletion
    * code exists, which is the point of sharing `applyTakedown`.
    * Re-election is the same min fold the m11 serve runs. Oracle =
    * the re-hash over media above the second horizon (age-off must be
    * exactly as if the expired media had never been ingested; the
    * expired payload bytes never rejoin any plan). */
  def mediaAgeOff(s: SparkSession, dir: String): DataFrame = {
    val out = buildMediaAgeOffIndex(s, dir)
    val Array(h1, h2) = new String(java.nio.file.Files.readAllBytes(
      out.resolve("_HORIZONS")), "UTF-8").trim.split("\\s+").map(_.toLong)
    DedupOps.ageOffMembers(s, out, h1)
    DedupOps.ageOffMembers(s, out, h2)
    DedupOps.aliveMembers(s, DedupOps.requireReady(out))
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("canon"))
      .orderBy(col("ahash"))
  }

  /** m13's OWN membership copy carrying the derived `ingest_ts`
    * column (t41's md5 idiom — in production the real capture time
    * the build has in hand). Horizons are the shared compile-time
    * fifths of the 2^32 time range — no bounds scan even at build. */
  private[graft] def m13IndexPath(s: SparkSession, dir: String)
      : java.nio.file.Path =
    DedupOps.artifactDir("media_members_m13",
      s"mediamembersm13:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")

  private[graft] def buildMediaTimeAgeOffIndex(s: SparkSession,
      dir: String): java.nio.file.Path = {
    val out = m13IndexPath(s, dir)
    DedupOps.ensureArtifact(out) {
      mediaAhashOf(mediaTable(s, dir).select(col("doc_id"), col("payload")))
        .select(col("ahash"), col("doc_id"))
        .withColumn("ingest_ts", expr(DedupOps.t41IngestTs))
        .write.mode("overwrite").parquet(out.resolve("members").toString)
    }
    out
  }

  /** m13: EVENT-TIME retention on the media shelf — t41's verb with
    * zero media-specific code: capture time is not monotone with doc
    * id (the expired set is non-contiguous in id space, which m12's
    * id-span predicate cannot express), so the timestamp rides IN the
    * members relation and [[DedupOps.ageOffMembers]]' `tsCol` filters
    * it index-locally — per-horizon markers/generations exactly as
    * t41, the expired payload bytes never rejoin any plan. Oracle =
    * the re-hash over media whose derived capture time survives the
    * second horizon. */
  def mediaTimeAgeOff(s: SparkSession, dir: String): DataFrame = {
    val out = buildMediaTimeAgeOffIndex(s, dir)
    DedupOps.ageOffMembers(s, out, DedupOps.T41H1, tsCol = "ingest_ts")
    DedupOps.ageOffMembers(s, out, DedupOps.T41H2, tsCol = "ingest_ts")
    DedupOps.aliveMembers(s, DedupOps.requireReady(out))
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("canon"))
      .orderBy(col("ahash"))
  }

  def phashDedup(s: SparkSession, dir: String): DataFrame = {
    val h = mediaAhash(s, dir)
    val g = h.groupBy(col("ahash"))
      .agg(count(lit(1)).as("group_n"), min(col("doc_id")).as("keeper"))
    h.join(g, Seq("ahash"))
      .select(col("doc_id"), col("ahash"), col("group_n"),
        (col("doc_id") === col("keeper")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** m6: media near-duplicate CLUSTERS — m5 only groups bit-identical
    * hashes; a re-encoded/slightly-edited image lands a few bits away,
    * so the deployment pass is a hamming-ball (≤ 3) over the 64-bit
    * average-hash, clustered transitively. Candidate generation is
    * t8's pigeonhole idiom widened to 64 bits: 4×16-bit blocks (≤ 3
    * differing bits leave ≥ 1 block identical), the shared
    * [[DedupOps.bucketCap]] sub-bucket split bounding degenerate
    * blocks, hamming filter BEFORE the pair-dedup exchange; the
    * surviving edges feed t13's connected-components machinery
    * (memoized converged labels). Output shape = t13's: one row per
    * clustered medium, component id = min member, `keep` on the
    * canonical. */
  def mediaDupClusters(s: SparkSession, dir: String): DataFrame = {
    DedupOps.requireOracleCap(s)
    DedupOps.connectedComponentsOf(s, ahashHammingEdges(mediaAhash(s, dir)),
      memoKey =
        s"m6:$dir@${DedupOps.pathFingerprint(s, s"$dir/documents.parquet")}")
  }

  /** The hamming-ball (≤ 3) candidate edges over a `(doc_id, ahash)`
    * relation — extracted so the adversarial bucket-cap spec can
    * drive it with crafted hashes. */
  private[queries] def ahashHammingEdges(h: DataFrame): DataFrame = {
    val cap = DedupOps.bucketCap(h.sparkSession)
    val rawBlocks = h
      .select(col("doc_id"), col("ahash"),
        explode(expr("transform(sequence(0, 3), " +
          "k -> struct(k AS k, shiftright(ahash, 16 * k) & 65535 AS blk))"))
          .as("b"))
      .select(col("doc_id"), col("ahash"), col("b.k"), col("b.blk"))
    val sizes = rawBlocks.groupBy(col("k"), col("blk"))
      .agg(count(lit(1)).as("cnt"))
    val blocks = rawBlocks.join(sizes, Seq("k", "blk"))
      .withColumn("sub", col("doc_id") % ceil(col("cnt") / lit(cap.toDouble)))
      .select(col("doc_id"), col("ahash"), col("k"), col("blk"), col("sub"))
    val edges = blocks.as("a")
      .join(blocks.as("b"),
        col("a.k") === col("b.k") && col("a.blk") === col("b.blk") &&
          col("a.sub") === col("b.sub") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.ahash ^ b.ahash)") <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    edges
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_phash_dedup" -> (phashDedup _),
    "m6_media_dup_clusters" -> (mediaDupClusters _),
    "m7_frame_dedup" -> (frameDedup _),
    "m1_media_schema" -> (mediaSchema _),
    "m2_media_features" -> (mediaFeatures _),
    "m3_media_resize" -> (mediaResize _),
    "m4_frame_sample" -> (frameSample _),
    "m8_media_index_probe" -> (mediaIndexProbe _),
    "m9_media_index_append" -> (mediaIndexAppendServe _),
    "m10_media_index_compact" -> (mediaIndexCompactServe _),
    "m11_media_tombstone_reelect" -> (mediaTombstoneReelect _),
    "m12_media_ageoff" -> (mediaAgeOff _),
    "m13_media_time_ageoff" -> (mediaTimeAgeOff _),
    "m14_media_takedown_external" -> (mediaTakedownExternal _))

  /** m5/m6 shared oracle prefix: the 64-bit average hash per payload,
    * ending at `a(doc_id, ahash)` — bit 63 of the BIGINT is the sign
    * bit (v6's formulation). */
  private[queries] lazy val ahashCtes: String =
    s"""h AS (
       | SELECT doc_id, repeat(md5(text), $PayloadRepeats) AS hx FROM documents),
       |px AS (
       | SELECT doc_id, i, ('0x' || substr(hx, i * 2 + 1, 2))::BIGINT AS v
       | FROM h, unnest(generate_series(0, 63)) AS u(i)),
       |t AS (SELECT doc_id, sum(v) AS total FROM px GROUP BY 1),
       |a AS (
       | SELECT px.doc_id,
       |  CAST(sum(CASE WHEN v * 64 > total
       |    THEN CASE WHEN i = 63 THEN -9223372036854775808
       |      ELSE (CAST(1 AS BIGINT) << i) END
       |    ELSE 0 END) AS BIGINT) AS ahash
       | FROM px JOIN t USING (doc_id) GROUP BY px.doc_id)""".stripMargin

  /** All four carry exact DuckDB oracles over the payload's hex
    * encoding (byte i = hex chars 2i+1..2i+2). m2's `byte_mean` is
    * bit-exact across engines despite the doubles: the byte sum S is an
    * integer, the payload length 64 divides 1e6 (1e6/64 = 15625), so
    * `mean * 1e6 = S * 15625` is an exactly-representable integer —
    * `math.rint` is the identity on it — and both engines perform the
    * same single IEEE division `(S * 15625) / 1e6`. */
  val oracle: Map[String, String] = Map(
    // delta media flagged against the BASE tranche's hash buckets only
    "m8_media_index_probe" ->
      s"""WITH $ahashCtes,
         |bounds AS (
         | SELECT (min(doc_id) + max(doc_id)) // 2 AS cut FROM documents),
         |bkt AS (
         | SELECT ahash, min(doc_id) AS canon
         | FROM a CROSS JOIN bounds WHERE doc_id <= cut GROUP BY 1)
         |SELECT a.doc_id, a.ahash, bkt.canon AS dup_of
         |FROM a CROSS JOIN bounds JOIN bkt USING (ahash)
         |WHERE a.doc_id > cut
         |ORDER BY a.doc_id""".stripMargin,
    // the full-corpus hash relation — the from-scratch REBUILD the
    // engine's append path must be indistinguishable from
    "m9_media_index_append" ->
      s"""WITH $ahashCtes
         |SELECT ahash, min(doc_id) AS canon
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // compaction must be invisible in the result — m10 is gated by
    // the same from-scratch rebuild as the append family it folds
    "m10_media_index_compact" ->
      s"""WITH $ahashCtes
         |SELECT ahash, min(doc_id) AS canon
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // m11: the rebuild over corpus-minus-deleted, deleted = every
    // multi-member hash bucket's canon (t37's worst case on this
    // shelf — each takedown forces a re-election)
    "m11_media_tombstone_reelect" ->
      s"""WITH $ahashCtes,
         |dels AS (
         | SELECT min(doc_id) AS doc_id FROM a
         | GROUP BY ahash HAVING count(*) >= 2)
         |SELECT ahash, min(doc_id) AS canon
         |FROM a WHERE doc_id NOT IN (SELECT doc_id FROM dels)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // m14: the external list's effect on PRESENT docs only (absent
    // ids no-op, duplicates idempotent) — the re-hash over docs not
    // divisible by 7, t39's oracle rule on the media shelf
    "m14_media_takedown_external" ->
      s"""WITH $ahashCtes
         |SELECT ahash, min(doc_id) AS canon
         |FROM a WHERE doc_id % 7 <> 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // m12: the re-hash over media above the SECOND horizon (the two
    // horizon advances compose; integer // matches the engine's Long
    // arithmetic, t38's rule on the media shelf)
    "m12_media_ageoff" ->
      s"""WITH $ahashCtes,
         |bounds AS (
         | SELECT min(doc_id) + (max(doc_id) - min(doc_id)) * 2 // 5 AS h2
         | FROM documents)
         |SELECT ahash, min(doc_id) AS canon
         |FROM a CROSS JOIN bounds WHERE doc_id > h2
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // m13: the re-hash over media whose DERIVED capture time (the t41
    // md5 idiom, bit-identical on both sides) survives the second
    // compile-time horizon — expired ids interleave with survivors
    "m13_media_time_ageoff" ->
      s"""WITH $ahashCtes
         |SELECT ahash, min(doc_id) AS canon
         |FROM a
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |    ::BIGINT > ${DedupOps.T41H2}
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m5_phash_dedup" -> {
      s"""WITH $ahashCtes,
         |g AS (
         | SELECT ahash, count(*) AS group_n, min(doc_id) AS keeper
         | FROM a GROUP BY 1)
         |SELECT a.doc_id, a.ahash, g.group_n, (a.doc_id = g.keeper) AS keep
         |FROM a JOIN g USING (ahash) ORDER BY a.doc_id""".stripMargin
    },
    "m6_media_dup_clusters" -> {
      // t8's pigeonhole at 64 bits + the t13 recursive-CC idiom; the
      // arithmetic >> sign-extension is masked off by & 65535 in both
      // engines, so blocks agree bit-for-bit
      s"""WITH RECURSIVE $ahashCtes,
         |blocks AS (
         | SELECT doc_id, ahash, k, (ahash >> (16 * k)) & 65535 AS blk
         | FROM a, unnest(generate_series(0, 3)) AS u(k)),
         |ksz AS (SELECT k, blk, count(*) AS cnt FROM blocks GROUP BY 1, 2),
         |ksub AS (
         | SELECT blocks.doc_id, blocks.ahash, blocks.k, blocks.blk,
         |  blocks.doc_id % CAST(ceil(cnt / ${DedupOps.LshBucketCap}.0) AS BIGINT) AS sub
         | FROM blocks JOIN ksz USING (k, blk)),
         |edges AS (
         | SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
         | FROM ksub x JOIN ksub y
         |   ON x.k = y.k AND x.blk = y.blk AND x.sub = y.sub
         |      AND x.doc_id < y.doc_id
         | WHERE bit_count(xor(x.ahash, y.ahash)) <= 3),
         |sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
         |reach(u, v) AS (
         | SELECT u, u FROM sym
         | UNION
         | SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v),
         |cc AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         |sizes AS (
         | SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         | FROM cc GROUP BY cluster_id)
         |SELECT cc.cluster_id, cc.doc_id, sizes.cluster_size,
         | cc.doc_id = cc.cluster_id AS keep
         |FROM cc JOIN sizes USING (cluster_id)
         |ORDER BY cluster_id, doc_id""".stripMargin
    },
    "m2_media_features" -> {
      // byte sum over hex chars [first, first + 2*n) as one list fold
      def bsum(n: Int) =
        s"CAST(list_sum(list_transform(range(0, $n), " +
          s"i -> ('0x' || substr(hx, i * 2 + 1, 2))::BIGINT)) AS BIGINT)"
      s"""WITH h AS (
         | SELECT doc_id, repeat(md5(text), $PayloadRepeats) AS hx FROM documents),
         |s AS (
         | SELECT doc_id, ${bsum(16 * PayloadRepeats)} AS s_all,
         |  ${bsum(4)} AS s4, CAST(len(hx) // 2 AS BIGINT) AS n_bytes
         | FROM h)
         |SELECT doc_id,
         | CAST(s_all * ${1000000 / (16 * PayloadRepeats)} AS DOUBLE) / 1000000.0
         |   AS byte_mean,
         | s4 AS thumb_sum, n_bytes
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "m1_media_schema" ->
      s"""SELECT doc_id, 'image' AS media_type, 8 AS width, 8 AS height,
         | CAST(octet_length(unhex(repeat(md5(text), $PayloadRepeats))) AS BIGINT)
         |   AS n_bytes,
         | md5(lower(hex(unhex(repeat(md5(text), $PayloadRepeats))))) AS payload_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_media_resize" -> {
      def b(i: String) = s"('0x' || substr(hx, ($i) * 2 + 1, 2))::BIGINT"
      s"""WITH h AS (
         | SELECT doc_id, repeat(md5(text), $PayloadRepeats) AS hx FROM documents),
         |px AS (
         | SELECT doc_id, hx, x, y
         | FROM h, generate_series(0, 3) AS gx(x), generate_series(0, 3) AS gy(y))
         |SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
         | CAST((${b("2*y*8 + 2*x")} + ${b("2*y*8 + 2*x + 1")} +
         |       ${b("(2*y+1)*8 + 2*x")} + ${b("(2*y+1)*8 + 2*x + 1")}) // 4
         |   AS BIGINT) AS v
         |FROM px ORDER BY doc_id, y, x""".stripMargin
    },
    "m7_frame_dedup" -> {
      s"""WITH h AS (
         | SELECT doc_id, repeat(md5(text), $PayloadRepeats) AS hx FROM documents),
         |f AS (
         | SELECT doc_id,
         |  md5(substr(hx, fi * ${2 * FrameBytes} + 1, ${2 * FrameBytes}))
         |    AS frame_md5
         | FROM h, unnest([0, 4, 8, 12]) AS u(fi))
         |SELECT frame_md5, CAST(count(*) AS BIGINT) AS n_frames,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | min(doc_id) AS keeper_doc
         |FROM f GROUP BY 1 HAVING count(*) > 1
         |ORDER BY frame_md5""".stripMargin
    },
    "m4_frame_sample" -> {
      def b(i: String) = s"('0x' || substr(hx, ($i) * 2 + 1, 2))::BIGINT"
      s"""WITH h AS (
         | SELECT doc_id, repeat(md5(text), $PayloadRepeats) AS hx FROM documents),
         |f AS (
         | SELECT doc_id, hx, fi FROM h, unnest([0, 4, 8, 12]) AS u(fi))
         |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
         | CAST((${b(s"fi * $FrameBytes")} + ${b(s"fi * $FrameBytes + 1")} +
         |       ${b(s"fi * $FrameBytes + 2")} + ${b(s"fi * $FrameBytes + 3")})
         |   AS BIGINT) AS frame_sum,
         | md5(substr(hx, fi * ${2 * FrameBytes} + 1, ${2 * FrameBytes})) AS frame_md5
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin
    })
}
