package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): treat media as opaque binary
  * columns + typed metadata. The decode step is STUBBED (no image/audio libs
  * in this container) with a deterministic fake, but the Spark-side plumbing
  * is real: binary columns, schema, partition-wise batch processing via
  * `mapPartitions`, and an explode-style frame sampler.
  *
  * At 100 TB: binary payloads stay columnar in parquet; metadata extraction
  * is scan-side; decode batches amortize model/codec setup per partition
  * (the mapPartitions shape below is exactly where a real decoder or an
  * Arrow-batched Python worker would slot in).
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** Deterministic real PNG: dimensions derive from the id, pixels from a
    * fixed formula, so every executor regenerates identical bytes. */
  private[graft] def synthPng(id: Long): Array[Byte] = {
    val w = (id % 48 + 8).toInt
    val h = (id % 32 + 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id + x * 31L + y * 7L) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Header-only image metadata from real bytes: (width, height, format),
    * None when no installed reader claims the payload. Reads the header via
    * the SPI reader, not a full pixel decode — the 100 TB-scan shape where
    * you want dimensions for millions of images without rasterizing them. */
  private[graft] def decodeImageMeta(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0),
            reader.getFormatName.toLowerCase))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  val defs: Seq[Q] = Seq(

    // binary column + scan-side metadata (real: bytes, hash; fake: w/h
    // derived deterministically, standing in for a header parse)
    Q("mm_binary_meta", Some("""
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        sha256(text) AS payload_sha,
        CAST(octet_length(CAST(text AS BLOB)) % 640 + 16 AS INT) AS fake_width,
        CAST(length(text) % 480 + 16 AS INT) AS fake_height
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"),
          (length(col("payload")) % 640 + 16).cast("int").as("fake_width"),
          (length(col("text")) % 480 + 16).cast("int").as("fake_height"))
        .orderBy("doc_id")
    },

    // partition-wise batch "decode": mapPartitions over binary payloads,
    // deterministic stub features (head/tail bytes + 8-byte checksum). A
    // real decoder replaces `decodeStub` only; schema/batching are final.
    Q("mm_decode_stub", Some("""
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        unicode(substr(text, 1, 1)) AS head_byte,
        unicode(substr(text, length(text), 1)) AS tail_byte,
        CAST(list_sum(list_transform(range(1, 9), i -> unicode(substr(text, i, 1)))) AS BIGINT) AS checksum8
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val src = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_bytes", LongType),
        StructField("head_byte", IntegerType), StructField("tail_byte", IntegerType),
        StructField("checksum8", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        // per-partition setup happens once (where a real codec would init)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, bytes.length.toLong,
            bytes.head & 0xff, bytes.last & 0xff,
            bytes.take(8).map(b => (b & 0xffL)).sum)
        }
      }(enc).orderBy("doc_id")
    },

    // batched "inference": rows are grouped into fixed-size batches inside
    // each partition (grouped(64)), the stub "model" scores the whole batch
    // at once, and results stream back out row-aligned — the exact shape of
    // Arrow-batched Pandas-UDF inference (mapInPandas) or a JVM ONNX
    // session, where batch setup cost amortizes across the batch. The stub
    // score is deterministic (mean of the first 16 codepoints).
    Q("mm_batch_infer", Some("""
      SELECT doc_id,
        CAST(list_sum(list_transform(range(1, least(length(text), 16) + 1),
          i -> unicode(substr(text, i, 1)))) AS BIGINT) AS feat_sum,
        round(CAST(list_sum(list_transform(range(1, least(length(text), 16) + 1),
          i -> unicode(substr(text, i, 1)))) AS DOUBLE)
          / least(length(text), 16), 6) AS score
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val src = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("feat_sum", LongType),
        StructField("score", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        // "model session" init happens here, once per partition
        rows.grouped(64).flatMap { batch =>
          // one "forward pass" per batch of 64
          batch.map { r =>
            val id = r.getLong(0)
            val cps = r.getString(1).codePoints().limit(16).toArray
            val sum = cps.map(_.toLong).sum
            Row(id, sum,
              BigDecimal(sum.toDouble / cps.length)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }(enc).orderBy("doc_id")
    },

    // REAL image decode via the JDK's own codec (javax.imageio — no extra
    // deps): each row synthesizes a genuine PNG payload (the binary media
    // column a production table carries), and the decode stage header-parses
    // it back — width/height/format come from the actual PNG bytes, not a
    // stub. The oracle knows the expected dimensions because the synth step
    // derives them deterministically from doc_id; a decode that didn't
    // really parse the payload could not reproduce them.
    Q("mm_decode_real", Some("""
      SELECT doc_id, CAST(doc_id % 48 + 8 AS INT) AS width,
        CAST(doc_id % 32 + 8 AS INT) AS height, 'png' AS format
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val src = t(s, dir, "documents").select(col("doc_id"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("width", IntegerType),
        StructField("height", IntegerType), StructField("format", StringType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        // codec setup once per partition (ImageIO scans its SPI registry)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = synthPng(id)
          val (w, h, fmt) = decodeImageMeta(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable payload for doc $id"))
          Row(id, w, h, fmt)
        }
      }(enc).orderBy("doc_id")
    },

    // frame sampling: every 10th token as a "frame" (the explode shape a
    // video frame-sampler produces: one row per sampled frame)
    Q("mm_frame_sample", Some("""
      SELECT doc_id, CAST((ord - 1) / 10 AS INT) AS frame_no, tok
      FROM (SELECT doc_id, unnest(string_split(text, chr(32))) AS tok,
              generate_subscripts(string_split(text, chr(32)), 1) AS ord
            FROM documents) f
      WHERE (ord - 1) % 10 = 0
      ORDER BY doc_id, frame_no""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("pos") % 10 === 0)
        .select(col("doc_id"), (col("pos") / 10).cast("int").as("frame_no"), col("tok"))
        .orderBy("doc_id", "frame_no")
    }
  )
}
