package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal payload handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, so a 100 TB media corpus flows through the
  * same relational plans as text (prune the binary column unless a stage
  * needs the bytes; all metadata predicates push down to parquet).
  *
  * The decode step itself (JPEG/WAV/MP4 codecs) is STUBBED — the container
  * has no media libraries — but the Spark-side contract is real: schema,
  * chunking, batch shape, and the mapPartitions plumbing are exactly what a
  * real decoder plugs into.
  */
object Binary {

  /** Wrap a source column as an opaque binary payload with typed metadata:
    * (id, payload: binary, n_bytes, sha256, format).
    * Format sniffing = magic-byte prefix dispatch (deterministic stand-in:
    * first byte class).
    */
  def asPayload(df: DataFrame, id: Column, raw: Column): DataFrame =
    df.select(
      id.as("id"),
      raw.cast("binary").as("payload"),
      octet_length(raw.cast("binary")).as("n_bytes"),
      sha2(raw.cast("binary"), 256).as("sha256"),
      when(raw.cast("binary").startsWith(lit(Array[Byte](0x74, 0x68))), "th-container")
        .otherwise("raw")
        .as("format")
    )

  /** Deterministic frame sampling: split the payload into fixed-size
    * chunks ("frames"), keep every `stride`-th, emit per-frame digests.
    * This is the plumbing a video pipeline uses (frame index, frame bytes)
    * — the decode of each frame is where a codec UDF would run.
    */
  def frameSample(payloads: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(col("n_bytes").cast("double") / frameBytes).cast("int")
    payloads
      .withColumn("n_frames", nFrames)
      .withColumn(
        "frames",
        // Empty payload => no frames (sequence(0, 0) would emit a phantom
        // frame 0 digesting an empty slice).
        when(col("n_frames") === 0, array().cast("array<struct<frame_idx:int,frame_md5:string>>"))
          .otherwise(
            transform(
              sequence(lit(0), col("n_frames") - 1, lit(stride)),
              i =>
                struct(i.as("frame_idx"), md5(col("payload").substr(i * frameBytes + 1, lit(frameBytes))).as("frame_md5"))
            )
          )
      )
      .select(col("id"), col("n_bytes"), col("n_frames"), col("frames"))
  }

  /** 2-D tile grid over an opaque payload raster — the ViT patch-grid
    * shape: interpret the payload as `rowBytes`-wide raster rows and cut
    * `tileH`×`tileW`-byte tiles, emitting per-tile digests in row-major
    * (tile_row, tile_col) order. Tile extraction is pure strided byte
    * arithmetic (one `aggregate` fold over the tile's row slices — real,
    * tested, engine-agnostic); decoding pixels out of a tile is where
    * the codec stub plugs in. Ragged edges truncate exactly like a real
    * image whose dimensions don't divide the patch size.
    */
  def tileGrid(payloads: DataFrame, rowBytes: Int, tileW: Int, tileH: Int): DataFrame = {
    require(rowBytes > 0 && tileW > 0 && tileH > 0, s"bad tile geometry: $rowBytes/$tileW/$tileH")
    val tilesPerRow = (rowBytes + tileW - 1) / tileW
    payloads
      .withColumn("n_rows", ceil(col("n_bytes").cast("double") / rowBytes).cast("int"))
      .withColumn("tile_rows", ceil(col("n_rows").cast("double") / tileH).cast("int"))
      .withColumn(
        "tile_idx",
        explode(
          when(col("tile_rows") === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(0), col("tile_rows") * tilesPerRow - 1))
        )
      )
      .withColumn("tile_row", (col("tile_idx") / tilesPerRow).cast("int"))
      .withColumn("tile_col", pmod(col("tile_idx"), lit(tilesPerRow)).cast("int"))
      .withColumn(
        "tile_md5",
        md5(
          aggregate(
            sequence(lit(0), lit(tileH - 1)),
            lit(Array.emptyByteArray),
            (acc, k) =>
              concat(
                acc,
                col("payload")
                  .substr((col("tile_row") * tileH + k) * rowBytes + col("tile_col") * tileW + 1, lit(tileW))
              )
          )
        )
      )
      .select("id", "n_bytes", "tile_row", "tile_col", "tile_md5")
  }

  /** Patch-feature extraction + mean pooling over a [[tileGrid]] — the
    * ViT pooled-embedding shape (per-patch features averaged into one
    * image vector). The per-tile "feature" is a STUB (hex bytes of the
    * tile digest scaled to [0,1] — deterministic, NOT a real vision
    * model); the pooling is the real contract: features accumulate as
    * EXACT integer sums per image with one double division at the end
    * (`Σh / (255·n)`), so the pooled embedding is bit-identical under
    * any partitioning — a double-sum mean would drift by partition
    * order. One hash aggregate with map-side partials; the payload
    * bytes never shuffle, only (id, digest-derived ints).
    */
  def tileFeaturePool(tiles: DataFrame, dims: Int = 4): DataFrame = {
    require(dims > 0 && dims <= 16, s"digest provides at most 16 feature bytes: $dims")
    val sums = (0 until dims).map(j =>
      sum(conv(substring(col("tile_md5"), 2 * j + 1, 2), 16, 10).cast("long")).as(s"_s$j")
    )
    tiles
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tiles"), sums: _*)
      .select(
        col("id") +: col("n_tiles") +:
          (0 until dims).map(j => (col(s"_s$j").cast("double") / (lit(255.0) * col("n_tiles"))).as(s"e$j")): _*
      )
  }

  /** Perceptual-class near-duplicate detection over opaque payloads —
    * the image near-dup stand-in (two images sharing most of their
    * patch digests are crops/re-encodes/paddings of each other; a real
    * pipeline swaps the tile digest for a pHash, the RELATIONAL shape
    * is identical): candidate pairs come ONLY from tile-digest
    * collisions (a tile-keyed self-join — the n-gram-Jaccard blocking
    * discipline on binary content), and a pair qualifies when its
    * shared-tile count reaches `minOverlap` of the smaller image's tile
    * set. Stop-tile pruning (`maxDf`): a digest shared by more than
    * `maxDf` images — letterbox padding, solid backgrounds — is
    * blocking-useless and quadratic in pair volume, so it is dropped
    * from CANDIDACY (the stopword rule for binary content; overlap
    * counts are computed over kept tiles on both sides, so the measure
    * stays symmetric). Payload bytes never shuffle — only (id, digest).
    */
  def nearDupByTiles(
      payloads: DataFrame,
      rowBytes: Int,
      tileW: Int,
      tileH: Int,
      minOverlap: Double,
      maxDf: Int
  ): DataFrame = {
    require(minOverlap > 0 && minOverlap <= 1, s"minOverlap in (0,1]: $minOverlap")
    require(maxDf > 1, s"maxDf must exceed 1 or no pair can ever form: $maxDf")
    val tiles = tileGrid(payloads, rowBytes, tileW, tileH)
      .select(col("id"), col("tile_md5"))
      .distinct()
    val freq = tiles.groupBy("tile_md5").agg(count(lit(1)).as("_df"))
    val kept = tiles.join(freq.filter(col("_df") <= maxDf), Seq("tile_md5"))
    val shared = kept.as("a")
      .join(kept.as("b"), col("a.tile_md5") === col("b.tile_md5") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a"), col("b.id").as("b"))
      .agg(count(lit(1)).as("shared"))
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("n_tiles"))
    shared
      .join(sizes.select(col("id").as("a"), col("n_tiles").as("n_tiles_a")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("n_tiles").as("n_tiles_b")), Seq("b"))
      .filter(col("shared") >= ceil(lit(minOverlap) * least(col("n_tiles_a"), col("n_tiles_b"))))
      .select("a", "b", "shared", "n_tiles_a", "n_tiles_b")
  }

  /** [[frameSample]] in exploded row form — one row per sampled frame
    * (id, n_bytes, n_frames, frame_idx, frame_md5). Scalar columns only, so
    * results are directly comparable/joinable (and hash-verifiable) without
    * array handling downstream.
    */
  def frameSampleRows(payloads: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    frameSample(payloads, frameBytes, stride)
      .select(col("id"), col("n_bytes"), col("n_frames"), explode(col("frames")).as("f"))
      .select(col("id"), col("n_bytes"), col("n_frames"), col("f.frame_idx").as("frame_idx"), col("f.frame_md5").as("frame_md5"))

  /** The decoder seam: a per-partition iterator transform with the batch
    * shape a native decoder needs. `decode` gets (id, payload) and returns
    * fixed-width features. The default implementation is a deterministic
    * fake (content-hash-seeded), clearly NOT a real codec.
    */
  def decodeFeatures(
      payloads: DataFrame,
      featureDim: Int,
      decode: (Long, Array[Byte]) => Array[Float] = stubDecoder
  ): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val dim = featureDim
    val fn = decode
    payloads
      .select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Real pipelines initialize the codec once per partition here.
        it.map { case (id, bytes) => (id, fn(id, bytes).take(dim)) }
      }
      .toDF("id", "features")
  }

  /** STUB decoder: NOT a real media codec. Deterministic bytes→features
    * fake so the plumbing is testable (replace with JNI/codec bindings).
    */
  def stubDecoder(id: Long, bytes: Array[Byte]): Array[Float] = {
    val h = java.util.Arrays.hashCode(bytes)
    Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xff) / 255.0f)
  }

  /** "Resize" for opaque media payloads: updates the typed metadata and
    * produces a deterministic downsampled byte sketch (every `factor`-th
    * byte). The relational shape — metadata columns driving partition
    * pruning, payload column rewritten — is exactly a real resizer's; the
    * pixel resampling itself is where a codec plugs in (STUB).
    */
  def resizeStub(payloads: DataFrame, factor: Int): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val f = factor
    payloads
      .select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val out = bytes.indices.collect { case i if i % f == 0 => bytes(i) }.toArray
        (id, out, bytes.length, out.length)
      }
      .toDF("id", "payload", "orig_bytes", "resized_bytes")
  }
}
