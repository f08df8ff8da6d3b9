package graft

/** Decode-cost floor for the codec-seam queries (r12 verdict #7): measures
  * the SINGLE-THREAD per-unit cost of each pure-JDK codec step the q73/q97/
  * q112 walls are made of, so the published sf1 walls decompose into
  * rows × unit-cost × (1/parallelism) instead of reading as plan defects.
  *
  * The 100 TB story for multimodal is the JNI swap seam: the Spark-side
  * plumbing (schema, partition-batched `mapPartitions`, dead-letter split)
  * is the permanent part, while `ImageIO`/`javax.sound` are the
  * container-friendly stand-ins a production build swaps for libjpeg-turbo
  * / ffmpeg bindings at the SAME seam. The numbers this harness emits are
  * the stand-ins' unit costs — what a swap would have to beat.
  *
  * Pure JVM, no SparkSession: the codecs are driver-equivalent code and a
  * floor must not fold scheduler noise into a per-frame microcost.
  * Writes `target/q112_floor.json`. Run: `sbt "runMain graft.MediaFloors"`.
  */
object MediaFloors {
  def main(args: Array[String]): Unit = {
    val nClips = args.headOption.map(_.toInt).getOrElse(2000)
    val ids = (1L to nClips.toLong).toArray

    // warm-up: JIT + ImageIO plugin discovery happen once per JVM, exactly
    // like the executors' first partition — excluded from the floor
    ids.take(200).foreach { id =>
      val avi = operators.Multimodal.aviBytesForId(id)
      operators.Multimodal.MjpegAviParser.decodeFrames(avi)
      val wav = operators.Multimodal.wavBytesForId(id)
      operators.Multimodal.JavaSoundDecoder.decodeAudio(wav)
    }

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (avis, tEncode) = timed(ids.map(operators.Multimodal.aviBytesForId))
    val (frames, tParse) =
      timed(avis.map(operators.Multimodal.MjpegAviParser.frames))
    val nFrames = frames.map(_.size).sum
    val (_, tJpeg) = timed(frames.foreach(_.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      require(img != null && img.getWidth > 0)
    }))
    // the query path runs decodeFrames (parse + ImageIO + per-pixel
    // brightness); timing it whole closes the decomposition — the delta
    // over parse+jpeg is the getRGB brightness loop
    val (_, tFull) =
      timed(avis.foreach(operators.Multimodal.MjpegAviParser.decodeFrames(_)))
    val (wavs, tWavEnc) = timed(ids.map(operators.Multimodal.wavBytesForId))
    val (_, tWavDec) =
      timed(wavs.foreach(operators.Multimodal.JavaSoundDecoder.decodeAudio(_)))

    def us(sec: Double, n: Long): Double = math.rint(sec * 1e6 / n * 10) / 10

    // Parallel-efficiency probe: the per-unit costs above are single
    // thread; the executor reality is 32 threads in ONE JVM hitting the
    // same JDK codec entry points. ImageIO's default disk-backed stream
    // cache (a temp FILE per read) and provider-registry synchronization
    // can serialize that — measure 32-thread throughput vs 1-thread.
    def parallelWall(threads: Int)(unit: Long => Unit): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = ids.map(id => pool.submit(new Runnable {
        def run(): Unit = unit(id) }))
      futs.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    val wavById = ids.map(id => id -> operators.Multimodal.wavBytesForId(id)).toMap
    val aviById = ids.map(id => id -> avis((id - 1).toInt)).toMap
    val wav1 = parallelWall(1)(id =>
      operators.Multimodal.JavaSoundDecoder.decodeAudio(wavById(id)): Unit)
    val wav32 = parallelWall(32)(id =>
      operators.Multimodal.JavaSoundDecoder.decodeAudio(wavById(id)): Unit)
    val riff1 = parallelWall(1)(id =>
      operators.Multimodal.RiffWavDecoder.decodeAudio(wavById(id)): Unit)
    val riff32 = parallelWall(32)(id =>
      operators.Multimodal.RiffWavDecoder.decodeAudio(wavById(id)): Unit)
    val avi1 = parallelWall(1)(id =>
      operators.Multimodal.MjpegAviParser.decodeFrames(aviById(id)): Unit)
    val avi32 = parallelWall(32)(id =>
      operators.Multimodal.MjpegAviParser.decodeFrames(aviById(id)): Unit)
    def eff(w1: Double, w32: Double): Double =
      math.rint(w1 / w32 * 100) / 100 // ideal = 32
    val json =
      s"""{"n_clips":$nClips,"n_frames":$nFrames,
         |"avi_encode_us_per_frame":${us(tEncode, nFrames)},
         |"riff_parse_us_per_frame":${us(tParse, nFrames)},
         |"jpeg_decode_us_per_frame":${us(tJpeg, nFrames)},
         |"full_decode_us_per_frame":${us(tFull, nFrames)},
         |"wav_encode_us_per_row":${us(tWavEnc, nClips)},
         |"wav_decode_us_per_row":${us(tWavDec, nClips)},
         |"wav_decode_speedup_32t":${eff(wav1, wav32)},
         |"riffwav_decode_us_per_row":${us(riff1, nClips)},
         |"riffwav_decode_speedup_32t":${eff(riff1, riff32)},
         |"avi_decode_speedup_32t":${eff(avi1, avi32)},
         |"note":"single-thread unit costs of the pure-JDK codec stand-ins behind q73/q97/q112; the RIFF walk is ~free — the wall is ImageIO JPEG decode, which is the JNI swap seam (libjpeg-turbo decodes the same frames ~10x faster). sf1 q112 wall ~= n_frames(sf1) * (encode+parse+decode) / 32 threads + bench floor."}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/q112_floor.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
