package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column model: media payloads are opaque `binary` columns
  * with a typed metadata struct riding alongside. Heavy per-item work
  * (decode, feature extraction) runs batch-wise over partitions
  * (`Dataset.mapPartitions`) so codec state can be reused per batch —
  * the Scala analogue of arrow-batched Python UDFs.
  *
  * The actual image/audio codecs are NOT available in this environment,
  * so [[decodeStub]] is a clearly-marked deterministic fake; everything
  * around it — the schema, the binary slicing, the partition-wise batch
  * shape, frame sampling — is real and oracle-tested.
  *
  * Scale: every operator here is map-only (zero shuffle). At 100 TB the
  * cost is the scan, which prunes to (id, media) columns only; frame
  * sampling multiplies rows but reduces bytes by the sampling factor.
  */
object Multimodal {

  /** One media item: payload + typed metadata. The metadata mirrors what
    * a real pipeline carries after ingest probing (container kind and
    * nominal dimensions), derived deterministically here from the id. */
  case class MediaRec(doc_id: Long, kind: String, width: Int, height: Int,
      media: Array[Byte])

  case class MediaFeatures(doc_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, n_frames: Long, mean_byte: Double)

  val FrameSize = 32

  /** Synthesize a media table from the documents fixture: the UTF-8
    * bytes of the text stand in for an encoded payload; kind/dims are
    * deterministic functions of the id so an oracle can re-derive them. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      (lit(64) + pmod(col("doc_id"), lit(16)) * 16).cast("int").as("width"),
      (lit(48) + pmod(col("doc_id"), lit(9)) * 16).cast("int").as("height"),
      col("text").cast("binary").as("media"))

  /** Batch-wise "decode + feature extract". The decode step is a STUB:
    * a real implementation would hand `rec.media` to a codec here; the
    * deterministic fake summarizes the payload bytes instead. The
    * partition-wise iteration (one pass, constant memory, reusable
    * per-batch state) is the part that matters at scale. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    val ds = media.as(Encoders.product[MediaRec])
    ds.mapPartitions { it =>
      // per-partition "codec" state would be initialized here
      it.map { rec =>
        val bytes = rec.media
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        MediaFeatures(rec.doc_id, rec.kind, rec.width, rec.height,
          bytes.length.toLong, (bytes.length / FrameSize).toLong, mean)
      }
    }(Encoders.product[MediaFeatures])
  }

  case class MediaEmb(doc_id: Long, dim: Int, n_bins: Long, c_max: Long,
      l2num: Long, n_bytes: Long)

  /** Batched "model inference" over media payloads — the fixed-batch
    * plumbing an embedding/caption model needs at scale: the partition
    * iterator is regrouped into batches of `batchSize` payloads, each
    * batch is handed to the "model" in ONE call (the stub computes a
    * 16-bin byte histogram per item; a real implementation would run
    * the accelerated forward pass here), and per-batch buffers are
    * reused. Emitted witnesses are exact integers (occupied bins, max
    * bin count, Σcount², total bytes) so results are independent of
    * batch boundaries, partitioning, and float summation order —
    * which also makes them oracle-checkable.
    *
    * Scale: map-only (zero shuffle); batch size bounds peak memory at
    * `batchSize × payload` regardless of partition size, the property
    * that keeps a GPU stage alive when partitions are skewed. */
  def embedStub(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[MediaEmb] = {
    require(batchSize > 0, "batchSize must be positive")
    val ds = media.as(Encoders.product[MediaRec])
    ds.mapPartitions { it =>
      val hist = new Array[Long](16) // reused across the batch
      it.grouped(batchSize).flatMap { batch =>
        // a real implementation submits `batch` to the model in one call
        batch.map { rec =>
          java.util.Arrays.fill(hist, 0L)
          val b = rec.media
          var i = 0
          while (i < b.length) { hist((b(i) & 0xff) >> 4) += 1; i += 1 }
          var nBins = 0L; var cMax = 0L; var l2 = 0L
          var k = 0
          while (k < 16) {
            val c = hist(k)
            if (c > 0) nBins += 1
            if (c > cMax) cMax = c
            l2 += c * c
            k += 1
          }
          MediaEmb(rec.doc_id, 16, nBins, cMax, l2, b.length.toLong)
        }
      }
    }(Encoders.product[MediaEmb])
  }

  /** Resize stub: deterministic byte downsample (every `every`-th
    * byte). A real implementation would decode + rescale via a codec;
    * the Spark-side shape — map-only pass, output bytes shrink by the
    * factor — is what matters at scale. */
  def resizeStub(media: DataFrame, every: Int): DataFrame = {
    val resize = udf { (b: Array[Byte], k: Int) =>
      val out = new Array[Byte]((b.length + k - 1) / k)
      var i = 0
      while (i < out.length) { out(i) = b(i * k); i += 1 }
      out
    }
    media.select(col("doc_id"),
      lower(hex(resize(col("media"), lit(every)))).as("resized_hex"))
  }

  /** Media table with PLANTED near-duplicate images — the
    * [[Similarity.withPlantedDupes]] precedent applied to payloads:
    * the fixture texts carry no byte-level perceptual near-dups (the
    * closest aHash pair sits at Hamming 9), so the sub-quadratic image
    * near-dup path is demonstrated on the union of the media table
    * with one perturbed copy per item (id + 10⁶, last payload byte
    * replaced) — a same-length, few-cell perturbation, the
    * re-encoded/one-pixel-edit regime real image dedup targets.
    * Deterministic and SQL-reproducible, so the oracle re-derives the
    * exact same corpus. Metadata (kind, dims) rides along from the
    * original, as a re-encode preserves it. */
  def mediaTableWithDupes(docs: DataFrame): DataFrame = {
    val base = mediaTable(docs)
    val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
      col("kind"), col("width"), col("height"),
      concat(expr("substring(media, 1, length(media) - 1)"),
        lit("~".getBytes("UTF-8"))).as("media"))
    base.unionByName(planted)
  }

  /** Per-image perceptual hashes ([[graft.functions.ImageAHash]] /
    * [[graft.functions.ImageDHash]] — exact-integer 64-cell
    * downsamples, codegen'd). Emitted as 16-hex-digit strings so the
    * witness dodges cross-engine 64-bit signedness. Map-only: at
    * 100 TB the cost is the pruned (doc_id, kind, media) scan. */
  def imagePHash(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("doc_id"),
        format_string("%016x", graft.functions.ImageAHash(col("media")))
          .as("ahash_hex"),
        format_string("%016x", graft.functions.ImageDHash(col("media")))
          .as("dhash_hex"))

  /** Image near-duplicate pairs: aHash fingerprints through the SAME
    * 4×16-bit banded Hamming join as text SimHash
    * ([[Dedup.bandedHamming64Pairs]]) — exact to distance ≤ 3, shuffle
    * is 4 small (band, key) rows per image, NEVER all-pairs. This is
    * to the image corpus what d1–d16 are to text: the d4 blocking
    * machinery applied to a perceptual (not token) fingerprint. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.bandedHamming64Pairs(
      media.filter(col("kind") === "image")
        .select(col("doc_id").as("id"),
          graft.functions.ImageAHash(col("media")).as("sh")),
      maxHamming)

  /** [[imageNearDupPairs]] memoized + Spark-cached per canonicalized
    * media plan — the [[Dedup.ngramJaccardPairsCached]] precedent:
    * image dedup CLUSTERING (m7) consumes exactly the pair set the
    * pair query (m6) itself produces, so one hash+band pass serves
    * both. Bounded LRU, unpersist-on-evict, lazily built. */
  def imageNearDupPairsCached(media: DataFrame, maxHamming: Int = 3): DataFrame =
    pairsCache.computeIfAbsent(
      (media.select(col("doc_id"), col("kind"), col("media"))
        .queryExecution.analyzed.canonicalized, maxHamming),
      _ => imageNearDupPairs(media, maxHamming).cache())

  private val pairsCache: java.util.Map[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int),
    DataFrame] = PlanCache.bounded(8)
  graft.model.Samples.registerSessionBoundCache(pairsCache)

  /** Incremental image near-dup: today's image batch against the
    * accumulated image corpus — [[Dedup.incrementalHamming64Pairs]]
    * over the aHash fingerprints (batch band rows broadcast, history
    * scanned but never shuffled, history×history pairs never formed).
    * The image twin of the text pipeline's d16. */
  def incrementalImageNearDup(freshMedia: DataFrame, historyMedia: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    def hs(m: DataFrame) = m.filter(col("kind") === "image")
      .select(col("doc_id").as("id"),
        graft.functions.ImageAHash(col("media")).as("sh"))
    Dedup.incrementalHamming64Pairs(hs(freshMedia), hs(historyMedia),
      maxHamming)
  }

  case class AudioWindow(doc_id: Long, window_idx: Long, energy: Long,
      quiet: Boolean)

  /** Windowed audio energy + silence flags — the segmentation step an
    * audio pipeline runs before transcription (trim/skip quiet spans):
    * the payload is cut into [[FrameSize]]-byte windows, each window's
    * energy is the exact integer Σ(byte−128)² (a real pipeline squares
    * PCM amplitudes; the byte stream stands in for samples), and a
    * window is flagged quiet iff energy·2 < the DOC's max window
    * energy — a per-row threshold, so the whole operator stays
    * map-only (no corpus aggregate, no shuffle; scan-speed at 100 TB).
    * Batch-wise over partitions like [[decodeStub]], reusing the
    * window buffer per batch. Trailing partial windows are dropped
    * (the [[frameSample]] convention). */
  def audioEnergy(spark: SparkSession, media: DataFrame): Dataset[AudioWindow] = {
    val ds = media.filter(col("kind") === "audio").as(Encoders.product[MediaRec])
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val b = rec.media
        val n = b.length / FrameSize
        val energies = new Array[Long](n)
        var w = 0
        var mx = 0L
        while (w < n) {
          var e = 0L
          var i = w * FrameSize
          val end = i + FrameSize
          while (i < end) {
            val d = (b(i) & 0xff) - 128
            e += d.toLong * d
            i += 1
          }
          energies(w) = e
          if (e > mx) mx = e
          w += 1
        }
        (0 until n).map(w => AudioWindow(rec.doc_id, w.toLong, energies(w),
          energies(w) * 2 < mx))
      }
    }(Encoders.product[AudioWindow])
  }

  /** Audio NEAR-dup (m12): pairs of audio docs sharing ≥ `threshold`
    * of the smaller side's energy-envelope shingles — the cheap
    * fingerprint a curation pass runs before any model: consecutive
    * window-energy triples ([[audioEnergy]]'s exact integers) are the
    * audio analogue of word shingles, so a re-encode that preserves
    * the envelope (or a copy with a perturbed tail) shares nearly all
    * of them. Trigram formation is MAP-ONLY ([[audioEnvelopeSets]]:
    * the envelope and its consecutive-triple shingles fall out of one
    * partition pass, zero pre-join shuffle — asserted by
    * PlanShapeSpec) and the pair join is the d15 PPJoin prefix
    * filter over the shingle sets (exact, never all-pairs). The
    * 2^-64 fingerprint-collision trade is d2/m11's. */
  case class EnvSet(id: Long, hs: Seq[Long], nsh: Long)

  /** Per-audio distinct energy-trigram fingerprint sets, MAP-ONLY: a
    * doc's windows are computed together in the partition pass (the
    * [[audioEnergy]] loop), so the consecutive-triple shingles fall
    * out of the same array with no lag-window shuffle at all — the
    * r12 first cut shuffled every window row by doc_id just to see
    * its two predecessors, and that shuffle was the whole ×100 cost
    * (12.8 s → see SCALE.md m12 row). Hashes are Spark's own XXH64
    * (seed 42) over the UTF-8 comma-joined oldest-first triple — the
    * same bytes `xxhash64(concat_ws(",", …))` would hash, so the
    * documented string↔hash oracle trade is unchanged. */
  def audioEnvelopeSets(media: DataFrame): DataFrame = {
    val ds = media.filter(col("kind") === "audio")
      .as(Encoders.product[MediaRec])
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val b = rec.media
        val n = b.length / FrameSize
        if (n < 3) Iterator.empty
        else {
          val e = new Array[Long](n)
          var w = 0
          while (w < n) {
            var s = 0L
            var i = w * FrameSize
            val end = i + FrameSize
            while (i < end) {
              val d = (b(i) & 0xff) - 128
              s += d.toLong * d
              i += 1
            }
            e(w) = s
            w += 1
          }
          val set = scala.collection.mutable.SortedSet.empty[Long]
          w = 2
          while (w < n) {
            val bytes = s"${e(w - 2)},${e(w - 1)},${e(w)}"
              .getBytes("UTF-8")
            set += org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(bytes,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                bytes.length, 42L)
            w += 1
          }
          Iterator.single(EnvSet(rec.doc_id, set.toSeq, set.size.toLong))
        }
      }
    }(Encoders.product[EnvSet]).toDF()
  }

  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
      threshold: Double): DataFrame =
    Dedup.containmentPrefixPairsFromSets(audioEnvelopeSets(media), threshold)

  /** Video frame-level exact dedup — shot/segment dedup via frame
    * fingerprints: every [[FrameSize]]-byte frame of every video keyed
    * by content, each frame annotated with its group's canonical
    * (minimum (doc, frame)) occurrence and group size. Survivors are
    * the canonical frames; a training pipeline drops or downweights
    * the rest. The [[graft.llm.Dedup.exactDedup]] shape applied one
    * level below the document: one hash shuffle keyed by frame
    * content, volume = one row per frame regardless of payload size —
    * at 100 TB of video the shuffle is the frame COUNT, not the bytes
    * (frames travel as hex of the 32-byte slice; a real pipeline ships
    * a pHash or md5 per decoded frame, same shape). */
  def frameDedup(media: DataFrame): DataFrame = {
    val frames = frameSample(media.filter(col("kind") === "video"), 1)
    // two long-keyed HASH aggregates, not one min(struct): a
    // struct-typed min buffer is immutable, which silently demotes the
    // sample-volume aggregate to SortAggregate (the repo's plan rule:
    // volume aggregations stay hash-based). Both passes are map-side
    // combined; the per-(frame, doc) table is distinct-pair-sized.
    val perDoc = frames.groupBy(col("frame_hex"), col("doc_id"))
      .agg(min(col("frame_idx")).as("_mf"), count(lit(1)).as("_n"))
    val groups = perDoc.groupBy(col("frame_hex"))
      .agg(min(col("doc_id")).as("canon_doc"), sum(col("_n")).as("group_size"))
    val canon = perDoc
      .join(groups, Seq("frame_hex"))
      .where(col("doc_id") === col("canon_doc"))
      .select(col("frame_hex"), col("canon_doc"), col("_mf").as("canon_frame"),
        col("group_size"))
    frames.join(canon, Seq("frame_hex"))
      .select(col("doc_id"), col("frame_idx"), col("canon_doc"),
        col("canon_frame"), col("group_size"))
  }

  /** Per-video distinct-frame fingerprint sets — the `(id, hs, nsh)`
    * shape [[graft.llm.Dedup.containmentPrefixPairsFromSets]] consumes:
    * every video keyed by the sorted set of its frames' 64-bit content
    * hashes. One hash aggregate over frame rows (volume = frame COUNT,
    * never payload bytes — the m10 scale argument); the 2^-64
    * hash-collision trade is the same one d2/d15 document for word
    * shingles. Videos shorter than one frame vanish (no identity to
    * compare), mirroring docs with < n tokens in the text family. */
  def videoFrameSets(media: DataFrame): DataFrame =
    frameSample(media.filter(col("kind") === "video"), 1)
      .select(col("doc_id").as("id"), xxhash64(col("frame_hex")).as("h"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("h"))).as("hs"))
      .withColumn("nsh", size(col("hs")).cast("long"))

  /** Video NEAR-dup (m11): pairs of videos sharing ≥ `threshold` of
    * the smaller side's distinct frames — Broder max-containment over
    * frame-fingerprint sets, the curation op m10's exact frame dedup
    * builds toward ("same video re-encoded with an extra intro/outro
    * or trailing perturbation" shares nearly all frames; symmetric
    * Jaccard dilutes when one side is much longer). Runs the d15
    * PPJoin prefix filter verbatim over [[videoFrameSets]]: exact,
    * rarest-frame prefix candidates + set-intersect verify, never an
    * all-pairs product (plan-asserted in PlanShapeSpec; the
    * PlanAuditSpec gate covers the whole surface). */
  def videoNearDupPairs(media: DataFrame, threshold: Double): DataFrame =
    Dedup.containmentPrefixPairsFromSets(videoFrameSets(media), threshold)

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every `every`-th full frame. Row count multiplies by frames/every;
    * byte volume DROPS by the sampling factor — at scale this runs as a
    * map-only projection before any expensive per-frame model. */
  def frameSample(media: DataFrame, every: Int): DataFrame = {
    val nFrames = (length(col("media")) / FrameSize).cast("int")
    val idx = when(nFrames >= 1, sequence(lit(0), nFrames - 1, lit(every)))
      .otherwise(array().cast("array<int>"))
    media
      .select(col("doc_id"), explode(idx).as("frame_idx"), col("media"))
      .select(col("doc_id"), col("frame_idx"),
        lower(hex(expr(s"substring(media, frame_idx * $FrameSize + 1, $FrameSize)")))
          .as("frame_hex"))
  }
}
