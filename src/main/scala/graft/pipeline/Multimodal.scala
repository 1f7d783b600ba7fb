package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): treat media as opaque binary
  * columns + typed metadata. Three modalities decode REAL payloads with
  * zero added dependencies — PNG via javax.imageio (mm_decode_real), WAV
  * via javax.sound.sampled (mm_decode_wav), MP4 via a hand-walked ISO-BMFF
  * box tree (mm_decode_mp4) — each header-parse-only, the scan shape for
  * dimensioning millions of assets without rasterizing them. mm_decode_stub
  * remains as the generic feature-extraction batch shape (deterministic
  * fake features) where a model or exotic codec would slot in.
  *
  * At 100 TB: binary payloads stay columnar in parquet; metadata extraction
  * is scan-side; decode batches amortize model/codec setup per partition
  * (the mapPartitions shape below is exactly where a heavier decoder or an
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
        // Knuth-hash the id so every channel (incl. the high red byte)
        // carries signal at small ids — mm_pixel_stats' oracle mirrors this
        img.setRGB(x, y, ((id * 2654435761L + x * 31L + y * 7L) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic real WAV: 16-bit PCM mono, rate and frame count derive
    * from the id so every executor regenerates identical bytes. */
  private[graft] def synthWav(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 8) * 1000).toFloat
    val frames = (400 + id % 100).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = ((id * 131 + i * 17) % 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic clone-group WAV for perceptual audio dedup: docs in the
    * same id/5 group render the SAME 16-bit PCM stream except the LAST
    * sample, which carries the doc id — byte-distinct clips, perceptually
    * identical audio (re-uploaded copies). The watermark sits past the
    * fingerprint's 512-sample window by construction (clips are >= 600
    * frames). Samples mix base and index multiplicatively so window
    * energies differ across groups. */
  private[graft] def synthWavClone(id: Long): Array[Byte] = {
    val base = id / 5
    val frames = (600 + base % 200).toInt
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (((base + 7) * (i + 13) * 2654435761L) % 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val wm = (id % 32768).toShort
    pcm(2 * (frames - 1)) = (wm & 0xff).toByte
    pcm(2 * (frames - 1) + 1) = ((wm >> 8) & 0xff).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 15-bit energy-gradient fingerprint over decoded PCM: the first 512
    * samples split into 16 windows of 32; one bit per adjacent-window
    * energy comparison (sum(w+1) > sum(w)) — the chromaprint-shaped
    * design reduced to amplitude bands so the oracle can predict every
    * bit. Constant-gain tolerant (gradients), watermark tolerant (the
    * grid stops before the clip tail). */
  private[graft] def audioFingerprint(pcm: Array[Byte]): Long = {
    val sums = new Array[Long](16)
    var w = 0
    while (w < 16) {
      var i = 0
      var s = 0L
      while (i < 32) {
        val idx = w * 32 + i
        s += ((pcm(2 * idx) & 0xff) | (pcm(2 * idx + 1) << 8)).toShort.toInt
        i += 1
      }
      sums(w) = s
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < 15) {
      if (sums(b + 1) > sums(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Header-only audio metadata from real bytes: (sampleRate, channels,
    * frames). Parses the RIFF/fmt header via the JDK's own reader — no
    * PCM decode, the shape for dimensioning millions of clips in a scan. */
  private[graft] def decodeAudioMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      Some((aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
        aff.getFrameLength.toLong))
    } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }

  /** Deterministic real MP4: a spec-valid ISO-BMFF tree (ftyp + moov/mvhd)
    * whose movie-header timescale/duration derive from the id. */
  private[graft] def synthMp4(id: Long): Array[Byte] = {
    val timescale = (600 + (id % 5) * 100).toInt
    val duration = (timescale * (1 + id % 30)).toInt
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(tpe.getBytes("US-ASCII"))
      bb.put(body)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    // mvhd version 0: flags, creation/modification, timescale, duration,
    // rate 1.0, volume 1.0, reserved, unity matrix, predefined, next track
    val mv = java.nio.ByteBuffer.allocate(100)
    mv.putInt(0)                  // version + flags
    mv.putInt(0); mv.putInt(0)    // creation, modification
    mv.putInt(timescale)
    mv.putInt(duration)
    mv.putInt(0x00010000)         // rate 1.0
    mv.putShort(0x0100.toShort)   // volume 1.0
    mv.putShort(0); mv.putInt(0); mv.putInt(0) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(mv.putInt)         // unity matrix
    (0 until 6).foreach(_ => mv.putInt(0)) // pre_defined
    mv.putInt(2)                  // next_track_ID
    val moov = box("moov", box("mvhd", mv.array()))
    ftyp ++ moov
  }

  /** Deterministic real MP4 WITH a sample table: ftyp + moov/mvhd plus a
    * trak/mdia/{mdhd,minf/stbl/{stts,stsz}} subtree — the codec-level
    * structures a real transcoder reads. Sample count, per-sample sizes
    * and the uniform tick duration all derive from the id. */
  private[graft] def synthMp4Track(id: Long): Array[Byte] = {
    val n = (24 + id % 48).toInt           // samples
    val timescale = 12800
    val delta = 512                        // ticks per sample
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(tpe.getBytes("US-ASCII"))
      bb.put(body)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val mv = java.nio.ByteBuffer.allocate(100)
    mv.putInt(0); mv.putInt(0); mv.putInt(0)
    mv.putInt(timescale); mv.putInt(n * delta)
    mv.putInt(0x00010000); mv.putShort(0x0100.toShort)
    mv.putShort(0); mv.putInt(0); mv.putInt(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(mv.putInt)
    (0 until 6).foreach(_ => mv.putInt(0))
    mv.putInt(2)
    // mdhd v0: flags, times, timescale, duration, language, predefined
    val md = java.nio.ByteBuffer.allocate(24)
    md.putInt(0); md.putInt(0); md.putInt(0)
    md.putInt(timescale); md.putInt(n * delta)
    md.putShort(0x55c4.toShort); md.putShort(0)
    // stts: one run of n samples at uniform delta
    val st = java.nio.ByteBuffer.allocate(16)
    st.putInt(0); st.putInt(1); st.putInt(n); st.putInt(delta)
    // stsz: sample_size=0 -> per-sample table
    val sz = java.nio.ByteBuffer.allocate(12 + 4 * n)
    sz.putInt(0); sz.putInt(0); sz.putInt(n)
    (0 until n).foreach(i => sz.putInt((200 + (id + i) % 800).toInt))
    val stbl = box("stbl", box("stts", st.array()) ++ box("stsz", sz.array()))
    val moov = box("moov", box("mvhd", mv.array()) ++
      box("trak", box("mdia", box("mdhd", md.array()) ++ box("minf", stbl))))
    ftyp ++ moov
  }

  /** Sample-table decode from real container bytes: walk to
    * trak/mdia/minf/stbl and read the stts run lengths + stsz size table —
    * what a transcoder or bitrate analyzer actually parses. Returns
    * (trackTimescale, totalDurationTicks, sampleSizes). */
  private[graft] def decodeSampleTable(bytes: Array[Byte]): Option[(Int, Long, Array[Int])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var timescale = 0
    var durTicks = 0L
    var sizes: Array[Int] = null
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val size = bb.getInt(pos)
        if (size < 8 || pos + size > end) return
        new String(bytes, pos + 4, 4, "US-ASCII") match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(pos + 8, pos + size)
          case "mdhd" if size >= 8 + 24 && (bytes(pos + 8) & 0xff) == 0 =>
            timescale = bb.getInt(pos + 20)
          case "stts" if size >= 8 + 8 =>
            val entries = bb.getInt(pos + 12)
            var e = 0
            while (e < entries) {
              durTicks += bb.getInt(pos + 16 + 8 * e).toLong *
                bb.getInt(pos + 20 + 8 * e)
              e += 1
            }
          case "stsz" if size >= 8 + 12 =>
            val fixed = bb.getInt(pos + 12)
            val count = bb.getInt(pos + 16)
            sizes =
              if (fixed != 0) Array.fill(count)(fixed)
              else Array.tabulate(count)(i => bb.getInt(pos + 20 + 4 * i))
          case _ =>
        }
        pos += size
      }
    }
    walk(0, bytes.length)
    if (timescale > 0 && sizes != null) Some((timescale, durTicks, sizes)) else None
  }

  /** Header-only video metadata from real bytes: walk the ISO-BMFF box
    * tree (the public MP4 container structure) to the moov/mvhd movie
    * header and read (majorBrand, timescale, durationTicks). No codec work
    * — the scan shape for dimensioning millions of clips. */
  private[graft] def decodeVideoMeta(bytes: Array[Byte]): Option[(String, Int, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var brand: Option[String] = None
    var mvhd: Option[(Int, Long)] = None
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val size = bb.getInt(pos)
        if (size < 8 || pos + size > end) return
        val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
        tpe match {
          case "ftyp" if size >= 12 =>
            brand = Some(new String(bytes, pos + 8, 4, "US-ASCII"))
          case "moov" => walk(pos + 8, pos + size, depth + 1)
          case "mvhd" if size >= 8 + 20 =>
            val version = bytes(pos + 8) & 0xff
            if (version == 0)
              mvhd = Some((bb.getInt(pos + 20), bb.getInt(pos + 24).toLong))
            else if (version == 1)
              mvhd = Some((bb.getInt(pos + 28), bb.getLong(pos + 32)))
          case _ =>
        }
        pos += size
      }
    }
    walk(0, bytes.length, 0)
    for ((ts, dur) <- mvhd) yield (brand.getOrElse(""), ts, dur)
  }

  /** Deterministic clone-group PNG for perceptual dedup: docs in the same
    * id/7 group render the SAME image except one watermark pixel at
    * (w-1, h-1) carrying the doc id — byte-distinct files, perceptually
    * identical content, the shape of re-uploaded/re-encoded duplicates in
    * a crawl. The watermark sits off the dHash sample grid by
    * construction (midpoint sampling never reaches the last pixel at
    * these dimensions). */
  private[graft] def synthPngClone(id: Long): Array[Byte] = {
    val base = id / 7
    val w = (base % 37 + 19).toInt
    val h = (base % 21 + 17).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((base * 2654435761L + x * 31L + y * 7L) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    img.setRGB(w - 1, h - 1, (id & 0xffffffL).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 56-bit gradient dHash over a decoded raster: luminance sampled at a
    * 9x7 midpoint grid, one bit per horizontal neighbor comparison
    * (lum(gx+1,gy) > lum(gx,gy)) — the public difference-hash design,
    * nearest-neighbor sampling instead of area resize so the oracle can
    * predict it exactly. Brightness-shift tolerant (gradients cancel
    * constant offsets), byte-level-watermark tolerant (grid never touches
    * edge pixels). */
  private[graft] def dHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    def lum(gx: Int, gy: Int): Int = {
      val x = (2 * gx + 1) * w / 18
      val y = (2 * gy + 1) * h / 14
      val v = img.getRGB(x, y)
      ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
    }
    var hash = 0L
    var gy = 0
    while (gy < 7) {
      var gx = 0
      while (gx < 8) {
        if (lum(gx + 1, gy) > lum(gx, gy)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
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

  /** Deterministic clone-group MJPEG-style MP4 for perceptual video dedup:
    * a spec-valid ISO-BMFF tree whose mdat holds REAL JPEG frames
    * (encodable/decodable by the JDK's own ImageIO), with stts/stsz/stco
    * sample tables describing them — the codec-level structure an MJPEG
    * track carries. Docs in the same id/3 group render IDENTICAL frames
    * (dims, count and pixels all derive from the base); byte-uniqueness
    * comes from a trailing `free` box carrying the doc id — the shape of
    * re-uploaded clips whose content matches but whose container metadata
    * differs. JPEG is lossy, so pixel values cannot be oracle-predicted —
    * but frame-identical clones decode to identical rasters, so the GROUP
    * structure is exact. */
  private[graft] def synthMjpegClone(id: Long): Array[Byte] = {
    val base = id / 3
    val nFrames = (3 + base % 3).toInt
    val w = (base % 21 + 16).toInt
    val h = (base % 13 + 12).toInt
    def frame(f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            ((base * 2654435761L + f * 97L + x * 31L + y * 7L) & 0xffffffL).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Array.tabulate(nFrames)(frame)
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(tpe.getBytes("US-ASCII"))
      bb.put(body)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.flatten)
    val chunkOffset = ftyp.length + 8 // first frame byte inside mdat
    val timescale = 12800
    val delta = 512
    val mv = java.nio.ByteBuffer.allocate(100)
    mv.putInt(0); mv.putInt(0); mv.putInt(0)
    mv.putInt(timescale); mv.putInt(nFrames * delta)
    mv.putInt(0x00010000); mv.putShort(0x0100.toShort)
    mv.putShort(0); mv.putInt(0); mv.putInt(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(mv.putInt)
    (0 until 6).foreach(_ => mv.putInt(0))
    mv.putInt(2)
    val md = java.nio.ByteBuffer.allocate(24)
    md.putInt(0); md.putInt(0); md.putInt(0)
    md.putInt(timescale); md.putInt(nFrames * delta)
    md.putShort(0x55c4.toShort); md.putShort(0)
    val st = java.nio.ByteBuffer.allocate(16)
    st.putInt(0); st.putInt(1); st.putInt(nFrames); st.putInt(delta)
    val sz = java.nio.ByteBuffer.allocate(12 + 4 * nFrames)
    sz.putInt(0); sz.putInt(0); sz.putInt(nFrames)
    frames.foreach(f => sz.putInt(f.length))
    val co = java.nio.ByteBuffer.allocate(12)
    co.putInt(0); co.putInt(1); co.putInt(chunkOffset)
    val stbl = box("stbl",
      box("stts", st.array()) ++ box("stsz", sz.array()) ++ box("stco", co.array()))
    val moov = box("moov", box("mvhd", mv.array()) ++
      box("trak", box("mdia", box("mdhd", md.array()) ++ box("minf", stbl))))
    val wm = java.nio.ByteBuffer.allocate(8)
    wm.putLong(id)
    ftyp ++ mdat ++ moov ++ box("free", wm.array())
  }

  /** Slice the JPEG frame payloads back out of real container bytes: walk
    * to stbl, read the stsz size table and the stco chunk offset, cut
    * consecutive frames from the mdat — what a frame extractor actually
    * does with an MJPEG track. */
  private[graft] def decodeMjpegFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var sizes: Array[Int] = null
    var chunkOff = -1
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val size = bb.getInt(pos)
        if (size < 8 || pos + size > end) return
        new String(bytes, pos + 4, 4, "US-ASCII") match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(pos + 8, pos + size)
          case "stsz" if size >= 8 + 12 =>
            val fixed = bb.getInt(pos + 12)
            val count = bb.getInt(pos + 16)
            sizes =
              if (fixed != 0) Array.fill(count)(fixed)
              else Array.tabulate(count)(i => bb.getInt(pos + 20 + 4 * i))
          case "stco" if size >= 8 + 8 =>
            if (bb.getInt(pos + 12) >= 1) chunkOff = bb.getInt(pos + 16)
          case _ =>
        }
        pos += size
      }
    }
    walk(0, bytes.length)
    if (sizes == null || chunkOff < 0) None
    else {
      var off = chunkOff
      Some(sizes.map { sz =>
        val f = java.util.Arrays.copyOfRange(bytes, off, off + sz)
        off += sz
        f
      })
    }
  }

  /** Perceptual clip fingerprint: SAMPLED frames (every 2nd — the
    * frame-sampling cost shape; decoding all frames of every clip is the
    * 100 TB sin this avoids) are JPEG-decoded and dHashed, the sequence
    * folded with the frame count into one 8-byte scalar. Returns
    * (frameCount, fingerprint). */
  private[graft] def videoFingerprint(bytes: Array[Byte]): Option[(Int, Long)] =
    decodeMjpegFrames(bytes).map { frames =>
      var fp = frames.length.toLong
      var i = 0
      while (i < frames.length) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(frames(i)))
        fp = fp * 1000003L ^ dHash(img)
        i += 2
      }
      (frames.length, fp)
    }

  // ---- media payloads THROUGH the storage layer --------------------------

  /** Binary payloads in a REAL stored column: the synthesized PNG/WAV/MP4
    * bytes are written ONCE per (process, sf dir) into a store table whose
    * binary columns ride the same parquet write path as any user `bytea`
    * column (the reference maps bytea -> binary,
    * pg_schema_column.go:89-90), and the rasterizing/dedup/curation tiers
    * below read the STORED column back. Parquet binary-column IO — the
    * dominant media cost at 100 TB — is therefore on the measured path;
    * the header-parse tiers above keep the in-executor synthesis so
    * PipeBench can compare the two shapes. Readers open a fresh Store
    * handle on the CALLER's session, so the process-wide cache retains
    * only a warehouse path string, never a session. */
  private val mediaWh = scala.collection.concurrent.TrieMap[String, String]()

  private[graft] def mediaAssets(s: SparkSession, dir: String): DataFrame = {
    // synchronized: TrieMap.getOrElseUpdate may evaluate the builder twice
    // under contention — two concurrent first-callers would each write the
    // full fixture and orphan one temp warehouse
    val wh = mediaWh.synchronized { mediaWh.getOrElseUpdate(dir, {
      val w = java.nio.file.Files.createTempDirectory("graft-media").toString
      val docs = Tables.df(s, dir, "documents").select(col("doc_id"), col("text"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("png", BinaryType), StructField("png_clone", BinaryType),
        StructField("wav", BinaryType), StructField("wav_clone", BinaryType),
        StructField("mp4_track", BinaryType), StructField("mjpeg", BinaryType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val payloads = docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, r.getString(1), synthPng(id), synthPngClone(id),
            synthWav(id), synthWavClone(id), synthMp4Track(id),
            synthMjpegClone(id))
        }
      }(enc)
      new Store(s, w).replace("media_assets", payloads)
      w
    }) }
    new Store(s, wh).read("media_assets")
  }

  // Shared by mm_image_dedup and mm_incremental_media_dedup: the oracle's
  // closed-form prediction of every dHash bit from the PNG synthesis
  // formula over the same 9x7 midpoint sampling grid the real decode uses.
  private val dhashCte = """grid AS (
        SELECT d.doc_id, d.doc_id // 7 AS base, gx.gx, gy.gy,
          ((d.doc_id // 7) % 37 + 19) AS w, ((d.doc_id // 7) % 21 + 17) AS h
        FROM documents d, range(0, 9) gx(gx), range(0, 7) gy(gy)),
      lum AS (
        SELECT doc_id, gx, gy,
          (((base * 2654435761 + ((2*gx+1)*w // 18) * 31 + ((2*gy+1)*h // 14) * 7) & 16777215) >> 16)
          + ((((base * 2654435761 + ((2*gx+1)*w // 18) * 31 + ((2*gy+1)*h // 14) * 7) & 16777215) >> 8) & 255)
          + (((base * 2654435761 + ((2*gx+1)*w // 18) * 31 + ((2*gy+1)*h // 14) * 7) & 16777215) & 255) AS v
        FROM grid),
      hashes AS (
        SELECT a.doc_id,
          CAST(sum(CASE WHEN b.v > a.v THEN (CAST(1 AS BIGINT) << (a.gy * 8 + a.gx)) ELSE 0 END) AS BIGINT) AS dhash
        FROM lum a JOIN lum b
          ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
        WHERE a.gx < 8
        GROUP BY a.doc_id)"""

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

    // REAL audio decode via the JDK's sampled-audio reader: per row a
    // genuine RIFF/WAV payload (16-bit PCM) is synthesized and its header
    // parsed back — sample rate, channels, frame count and duration come
    // from the actual bytes. Same honesty contract as mm_decode_real: the
    // oracle's expected values derive from the id, so only a real header
    // parse reproduces them.
    Q("mm_decode_wav", Some("""
      SELECT doc_id, CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        1 AS channels, CAST(400 + doc_id % 100 AS BIGINT) AS n_frames,
        round(CAST(400 + doc_id % 100 AS DOUBLE) * 1000
          / (8000 + (doc_id % 8) * 1000), 3) AS duration_ms
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val src = t(s, dir, "documents").select(col("doc_id"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType), StructField("n_frames", LongType),
        StructField("duration_ms", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = synthWav(id)
          val (rate, ch, frames) = decodeAudioMeta(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable wav for doc $id"))
          Row(id, rate, ch, frames,
            BigDecimal(frames.toDouble * 1000 / rate)
              .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }(enc).orderBy("doc_id")
    },

    // REAL video-container decode: per row a spec-valid MP4 (ISO-BMFF
    // ftyp + moov/mvhd) is synthesized and its box tree walked back —
    // brand, timescale, duration come from the actual container bytes.
    Q("mm_decode_mp4", Some("""
      SELECT doc_id, 'isom' AS brand,
        CAST(600 + (doc_id % 5) * 100 AS INT) AS timescale,
        CAST((600 + (doc_id % 5) * 100) * (1 + doc_id % 30) AS BIGINT) AS duration_ticks,
        CAST(1 + doc_id % 30 AS DOUBLE) AS duration_sec
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val src = t(s, dir, "documents").select(col("doc_id"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("brand", StringType),
        StructField("timescale", IntegerType),
        StructField("duration_ticks", LongType),
        StructField("duration_sec", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = synthMp4(id)
          val (brand, ts, dur) = decodeVideoMeta(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable mp4 for doc $id"))
          Row(id, brand, ts, dur, dur.toDouble / ts)
        }
      }(enc).orderBy("doc_id")
    },

    // RASTERIZING image decode: beyond the header parse, each synthetic PNG
    // is decoded to pixels (ImageIO.read — a full IDAT inflate + defilter)
    // and per-channel statistics computed from the raster: the
    // quality-filter features (channel means, brightness extremes) a real
    // pipeline gates images on. The oracle reproduces the expected stats
    // from the deterministic pixel formula
    // ((id * 2654435761 + 31x + 7y) & 0xffffff) — Knuth-hashed id so
    // adjacent docs get unrelated rasters —
    // via a lateral range join — a decode that didn't truly rasterize the
    // payload could not match the per-pixel aggregate. Exact integer sums
    // are emitted alongside the rounded means so the hash check is
    // bit-proof. Scale shape: the payload comes from the STORED binary
    // column (mediaAssets — real parquet binary IO, not in-executor
    // synthesis) and decode is scan-side mapPartitions (codec state per
    // partition), no shuffle — at 100 TB this runs wherever the binary
    // column lives, one pass.
    Q("mm_pixel_stats", Some("""
      SELECT doc_id, width, height,
        sum_r, sum_g, sum_b,
        round(CAST(sum_r AS DOUBLE) / (width * height), 4) AS mean_r,
        round(CAST(sum_g AS DOUBLE) / (width * height), 4) AS mean_g,
        round(CAST(sum_b AS DOUBLE) / (width * height), 4) AS mean_b,
        max_lum, min_lum
      FROM (
        SELECT d.doc_id,
          CAST(d.doc_id % 48 + 8 AS INT) AS width,
          CAST(d.doc_id % 32 + 8 AS INT) AS height,
          CAST(sum(((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 16) AS BIGINT) AS sum_r,
          CAST(sum((((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 8) & 255) AS BIGINT) AS sum_g,
          CAST(sum(((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) & 255) AS BIGINT) AS sum_b,
          CAST(max((((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 16)
            + ((((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 8) & 255)
            + (((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) & 255)) AS INT) AS max_lum,
          CAST(min((((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 16)
            + ((((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) >> 8) & 255)
            + (((d.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) & 255)) AS INT) AS min_lum
        FROM documents d, range(0, 55) x(x), range(0, 39) y(y)
        WHERE x.x < d.doc_id % 48 + 8 AND y.y < d.doc_id % 32 + 8
        GROUP BY d.doc_id) s
      ORDER BY doc_id""")) { (s, dir) =>
      val src = mediaAssets(s, dir).select(col("doc_id"), col("png"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("sum_r", LongType), StructField("sum_g", LongType),
        StructField("sum_b", LongType),
        StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
        StructField("mean_b", DoubleType),
        StructField("max_lum", IntegerType), StructField("min_lum", IntegerType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var maxLum = Int.MinValue; var minLum = Int.MaxValue
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              val (cr, cg, cb) = ((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
              sr += cr; sg += cg; sb += cb
              val lum = cr + cg + cb
              if (lum > maxLum) maxLum = lum
              if (lum < minLum) minLum = lum
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          def mean(sum: Long) = BigDecimal(sum.toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(id, w, h, sr, sg, sb, mean(sr), mean(sg), mean(sb), maxLum, minLum)
        }
      }(enc).orderBy("doc_id")
    },

    // RASTERIZING audio decode: the WAV payload's PCM samples are actually
    // read back (AudioSystem stream decode, not just the RIFF header) and
    // amplitude statistics computed from them — the loudness/clipping
    // features an audio pipeline gates clips on. The oracle reproduces the
    // stats from the deterministic sample formula ((id·131 + i·17) mod
    // 32768); only a real PCM decode matches the per-sample aggregate.
    // Exact integer sums ride along so the hash check is bit-proof; rms is
    // strictly positive so the rounded double carries no -0.0 trap.
    Q("mm_audio_stats", Some("""
      SELECT doc_id, n_frames, sum_amp, sum_sq, peak,
        round(sqrt(CAST(sum_sq AS DOUBLE) / n_frames), 4) AS rms
      FROM (
        SELECT d.doc_id,
          CAST(400 + d.doc_id % 100 AS BIGINT) AS n_frames,
          CAST(sum((d.doc_id * 131 + i.i * 17) % 32768) AS BIGINT) AS sum_amp,
          CAST(sum(((d.doc_id * 131 + i.i * 17) % 32768)
            * ((d.doc_id * 131 + i.i * 17) % 32768)) AS BIGINT) AS sum_sq,
          CAST(max((d.doc_id * 131 + i.i * 17) % 32768) AS INT) AS peak
        FROM documents d, range(0, 500) i(i)
        WHERE i.i < 400 + d.doc_id % 100
        GROUP BY d.doc_id) s
      ORDER BY doc_id""")) { (s, dir) =>
      val src = mediaAssets(s, dir).select(col("doc_id"), col("wav"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_frames", LongType),
        StructField("sum_amp", LongType), StructField("sum_sq", LongType),
        StructField("peak", IntegerType), StructField("rms", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var (sumAmp, sumSq) = (0L, 0L)
          var peak = Int.MinValue
          var i = 0
          while (i < n) {
            // 16-bit little-endian PCM, as the WAV format stores it
            val s16 = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
            sumAmp += s16; sumSq += s16.toLong * s16
            if (s16 > peak) peak = s16
            i += 1
          }
          val rms = BigDecimal(math.sqrt(sumSq.toDouble / n))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(id, n.toLong, sumAmp, sumSq, peak, rms)
        }
      }(enc).orderBy("doc_id")
    },

    // PERCEPTUAL audio dedup: byte-distinct clone-group WAVs (id-watermark
    // last sample) are stream-decoded, fingerprinted from the PCM, and
    // grouped on the fingerprint — re-uploaded audio copies collapse like
    // mm_image_dedup's images. The oracle predicts every fingerprint bit
    // from the synthesis formula over the same 16x32-sample windows; the
    // dedup shuffle keys an 8-byte scalar, never payload bytes.
    Q("mm_audio_dedup", Some("""
      WITH win AS (
        SELECT d.doc_id, i.i // 32 AS w,
          sum(((d.doc_id // 5 + 7) * (i.i + 13) * 2654435761) % 32768) AS e
        FROM documents d, range(0, 512) i(i)
        GROUP BY d.doc_id, i.i // 32),
      hashes AS (
        SELECT a.doc_id,
          CAST(sum(CASE WHEN b.e > a.e THEN (CAST(1 AS BIGINT) << a.w) ELSE 0 END) AS BIGINT) AS ahash
        FROM win a JOIN win b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        WHERE a.w < 15
        GROUP BY a.doc_id)
      SELECT doc_id, ahash,
        CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS group_n,
        CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY ahash)
          THEN 1 ELSE 0 END AS keep
      FROM hashes ORDER BY doc_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val src = mediaAssets(s, dir).select(col("doc_id"), col("wav_clone"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("ahash", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val hashed = src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          Row(id, audioFingerprint(ais.readAllBytes()))
        }
      }(enc)
      val byHash = Window.partitionBy(col("ahash"))
      hashed
        .withColumn("group_n", count(lit(1)).over(byHash))
        .withColumn("keep",
          when(col("doc_id") === min(col("doc_id")).over(byHash), 1)
            .otherwise(0))
        .orderBy("doc_id")
    },

    // SAMPLE-TABLE video decode: the codec-level tier for the video
    // modality (the analog of pixel/PCM rasterizing) — a spec-valid MP4
    // with a real trak/mdia/minf/stbl subtree is synthesized per row and
    // its stts run-length + stsz size tables walked back; sample count,
    // byte volume, peak sample and bitrate come from the actual container
    // structures a transcoder parses. Oracle predicts them from the
    // synthesis formulas; exact integer sums keep the hash bit-proof.
    Q("mm_video_samples", Some("""
      SELECT doc_id, n_samples, total_bytes, max_sample, duration_ticks,
        round(CAST(duration_ticks AS DOUBLE) / 12800, 4) AS duration_s,
        round(CAST(total_bytes AS DOUBLE) * 8 * 12800 / duration_ticks, 2) AS bitrate_bps
      FROM (
        SELECT d.doc_id,
          CAST(24 + d.doc_id % 48 AS BIGINT) AS n_samples,
          CAST(sum(200 + (d.doc_id + i.i) % 800) AS BIGINT) AS total_bytes,
          CAST(max(200 + (d.doc_id + i.i) % 800) AS INT) AS max_sample,
          CAST((24 + d.doc_id % 48) * 512 AS BIGINT) AS duration_ticks
        FROM documents d, range(0, 72) i(i)
        WHERE i.i < 24 + d.doc_id % 48
        GROUP BY d.doc_id) s
      ORDER BY doc_id""")) { (s, dir) =>
      val src = mediaAssets(s, dir).select(col("doc_id"), col("mp4_track"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_samples", LongType),
        StructField("total_bytes", LongType), StructField("max_sample", IntegerType),
        StructField("duration_ticks", LongType),
        StructField("duration_s", DoubleType), StructField("bitrate_bps", DoubleType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (ts, durTicks, sizes) = decodeSampleTable(r.getAs[Array[Byte]](1))
            .getOrElse(throw new IllegalStateException(s"bad sample table for $id"))
          val total = sizes.map(_.toLong).sum
          def r2(x: Double, sc: Int) = BigDecimal(x)
            .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(id, sizes.length.toLong, total, sizes.max, durTicks,
            r2(durTicks.toDouble / ts, 4),
            r2(total.toDouble * 8 * ts / durTicks, 2))
        }
      }(enc).orderBy("doc_id")
    },

    // PERCEPTUAL image dedup: byte-distinct clone-group PNGs (id-watermark
    // pixel) are really decoded, dHashed from the raster, and grouped on
    // the hash — the multimodal analog of exact text dedup, catching
    // re-uploaded copies whose bytes differ. The oracle predicts every
    // dHash bit from the synthesis formula over the same 9x7 midpoint
    // grid, so a decode that didn't rasterize (or sampled differently)
    // cannot match. Scale shape: decode + hash are scan-side; the only
    // shuffle keys an 8-byte scalar (never payload bytes) — identical to
    // the exact-dedup contract at 100 TB.
    Q("mm_image_dedup", Some(s"""
      WITH $dhashCte
      SELECT doc_id, dhash,
        CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_n,
        CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY dhash)
          THEN 1 ELSE 0 END AS keep
      FROM hashes ORDER BY doc_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val src = mediaAssets(s, dir).select(col("doc_id"), col("png_clone"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("dhash", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val hashed = src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          Row(id, dHash(img))
        }
      }(enc)
      val byHash = Window.partitionBy(col("dhash"))
      hashed
        .withColumn("group_n", count(lit(1)).over(byHash))
        .withColumn("keep",
          when(col("doc_id") === min(col("doc_id")).over(byHash), 1)
            .otherwise(0))
        .orderBy("doc_id")
    },

    // INCREMENTAL perceptual media dedup through the write path: assets
    // arrive in three ingest batches, each really PNG-decoded and dHashed
    // ONCE at ingest (the fingerprint is a stored column — payload bytes
    // never enter the store table, the index, or any exchange), and the
    // Store's phash index accumulates exact-fingerprint clone pairs batch
    // by batch. A probe touches only fingerprint values the batch carries;
    // no asset is ever re-decoded. The accumulated pair table must equal
    // the full clone-pair recompute the mm_image_dedup oracle predicts
    // bit-for-bit from the synthesis formulas.
    Q("mm_incremental_media_dedup", Some(s"""
      WITH $dhashCte
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.dhash AS fp
      FROM hashes x JOIN hashes y ON x.dhash = y.dhash AND x.doc_id < y.doc_id
      ORDER BY id_a, id_b""")) { (s, dir) =>
      val src = mediaAssets(s, dir).select(col("doc_id"), col("png_clone"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("dhash", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      // the ingest-batch filter sits BELOW the decode, so each asset is
      // rasterized exactly once, in the batch that carries it
      def batchHashed(i: Long): DataFrame = src
        .filter(pmod(col("doc_id"), lit(3)) === i)
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            Row(id, dHash(img))
          }
        }(enc)
      val store = new Store(s,
        java.nio.file.Files.createTempDirectory("graft-mminc").toString)
      store.replace("mminc_media", batchHashed(0))
      store.enableDedupIndex("mminc_media", "doc_id", "dhash", 0, family = "phash")
      (1L to 2L).foreach { i =>
        store.appendCompacting("mminc_media", batchHashed(i))
      }
      store.read(store.dedupPairsTable("mminc_media", "phash"))
        .orderBy("id_a", "id_b")
    },

    // PERCEPTUAL video dedup — the third corner of the image/audio/video
    // perceptual triangle: byte-distinct clone-group MJPEG clips (frames
    // identical within an id/3 group, uniqueness in a trailing `free`
    // metadata box) are read from the STORED binary column, their JPEG
    // frames sliced back out via the stsz/stco sample tables, SAMPLED
    // frames (every 2nd) really JPEG-decoded and dHashed, and the clip
    // fingerprint (frame-hash sequence fold) drives the dedup. JPEG is
    // lossy so the oracle cannot predict hash VALUES — but frame-identical
    // clones decode identically, so it pins the exact GROUP structure
    // (membership, size, keeper), which only a real frame decode + stable
    // perceptual hash reproduces. The shuffle keys the 8-byte fingerprint
    // scalar; payload bytes never enter an exchange.
    Q("mm_video_dedup", Some("""
      SELECT doc_id,
        CAST(3 + (doc_id // 3) % 3 AS INT) AS n_frames,
        CAST(count(*) OVER (PARTITION BY doc_id // 3) AS BIGINT) AS group_n,
        CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY doc_id // 3)
          THEN 1 ELSE 0 END AS keep
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val src = mediaAssets(s, dir).select(col("doc_id"), col("mjpeg"))
      // Candidate-then-verify, the same shape as the MinHash pipeline:
      // the sampled-frame PERCEPTUAL fingerprint buckets candidates (an
      // 8-byte shuffle key, never the payload), and a full-frame content
      // hash computed in the same decode pass splits perceptual
      // COLLISIONS apart (dHash over tiny frames genuinely collides
      // across distinct clips at corpus scale — observed at sf0.1 — and
      // a dedup that merges two different videos on a hash accident is
      // wrong; at 100 TB this is exactly why LSH/perceptual buckets
      // always get a verify stage). The verify hashes the DECODED frame
      // payloads, not the container: clone clips share content but carry
      // distinct container metadata (the watermark box) by design.
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_frames", IntegerType),
        StructField("vhash", LongType), StructField("chash", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val hashed = src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = decodeMjpegFrames(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable clip for doc $id"))
          var fp = frames.length.toLong
          var i = 0
          while (i < frames.length) { // sampled frames: the candidate key
            fp = fp * 1000003L ^ dHash(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frames(i))))
            i += 2
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          frames.foreach(md.update) // every frame: the verify key
          Row(id, frames.length, fp,
            java.nio.ByteBuffer.wrap(md.digest).getLong)
        }
      }(enc)
      val byHash = Window.partitionBy(col("vhash"), col("chash"))
      hashed
        .withColumn("group_n", count(lit(1)).over(byHash))
        .withColumn("keep",
          when(col("doc_id") === min(col("doc_id")).over(byHash), 1)
            .otherwise(0))
        .select(col("doc_id"), col("n_frames"), col("group_n"), col("keep"))
        .orderBy("doc_id")
    },

    // PROGRESSIVE multimodal curation: the three-tier filter pipeline a
    // media corpus runs, composed end-to-end — tier 1 header-parses every
    // asset and gates on dimensions (O(KB)/asset); tier 2 RASTERIZES ONLY
    // TIER-1 SURVIVORS and gates on mean blue channel (O(asset), the
    // expensive tier the earlier gate shields); tier 3 gates the paired
    // text on token count. Each tier is a separate mapPartitions over the
    // shrinking survivor set, so the plan itself embodies "each tier cuts
    // the bytes the next one touches". The oracle reproduces every gate
    // from the synthesis formulas.
    Q("mm_corpus_curation", Some("""
      WITH t1 AS (
        SELECT doc_id, text,
          CAST(doc_id % 48 + 8 AS INT) AS width,
          CAST(doc_id % 32 + 8 AS INT) AS height
        FROM documents WHERE doc_id % 48 + 8 >= 20),
      t2 AS (
        SELECT t1.doc_id, t1.text, t1.width, t1.height,
          round(CAST(sum(((t1.doc_id * 2654435761 + x.x * 31 + y.y * 7) & 16777215) & 255) AS DOUBLE)
            / (t1.width * t1.height), 4) AS mean_b
        FROM t1, range(0, 55) x(x), range(0, 39) y(y)
        WHERE x.x < t1.width AND y.y < t1.height
        GROUP BY t1.doc_id, t1.text, t1.width, t1.height),
      t3 AS (
        SELECT doc_id, width, height, mean_b,
          CAST(len(string_split(text, chr(32))) AS BIGINT) AS n_tokens
        FROM t2 WHERE mean_b <= 127.5)
      SELECT doc_id, width, height, mean_b, n_tokens
      FROM t3 WHERE n_tokens >= 10
      ORDER BY doc_id""")) { (s, dir) =>
      // payload + paired text come from the STORED binary column; tier 1
      // header-parses the stored bytes and carries them forward so tier 2
      // rasterizes ONLY tier-1 survivors without re-reading the file —
      // the payload never enters an exchange (dropped before the final
      // ORDER BY's range partitioning)
      val src = mediaAssets(s, dir).select(col("doc_id"), col("text"), col("png"))
      val s1 = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("width", IntegerType), StructField("height", IntegerType),
        StructField("png", BinaryType)))
      val e1 = org.apache.spark.sql.Encoders.row(s1)
      val tier1 = src.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, _) = decodeImageMeta(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable payload for doc $id"))
          Row(id, r.getString(1), w, h, bytes)
        }
      }(e1).filter(col("width") >= 20)
      // tier 2: full rasterization, ONLY for tier-1 survivors
      val s2 = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("width", IntegerType), StructField("height", IntegerType),
        StructField("mean_b", DoubleType)))
      val e2 = org.apache.spark.sql.Encoders.row(s2)
      val tier2 = tier1.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](4)))
          var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sb += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          Row(id, r.getString(1), r.getInt(2), r.getInt(3),
            BigDecimal(sb.toDouble / n)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }(e2).filter(col("mean_b") <= 127.5)
      // tier 3: text-quality gate over the paired text column
      tier2
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .filter(col("n_tokens") >= 10)
        .select(col("doc_id"), col("width"), col("height"),
          col("mean_b"), col("n_tokens"))
        .orderBy("doc_id")
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
