package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("manifest: size matches utf-8 payload bytes, codec cycles deterministically") {
    val rows = Multimodal.mmManifest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, size, codec) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(size > 0)
      assert(codec === Seq("h264", "vp9", "av1")((id % 3).toInt))
      assert(r.getInt(3) >= 320 && r.getInt(4) >= 240)
    }
  }

  test("frame sampling: chunk math exact on a known payload") {
    val payload = Array.fill[Byte](300)(7) // 300 bytes, frameSize 64 → 5 frames
    val media = Seq((42L, payload)).toDS()
    val frames = Multimodal.frameSample(media, frameSize = 64, stride = 2).collect()
    // frames 0,1,2,3,4 → sampled idx 0,2,4
    assert(frames.map(_.frame_idx).sorted.sameElements(Array(0, 2, 4)))
    assert(frames.forall(_.media_id == 42L))
    val last = frames.maxBy(_.frame_idx)
    assert(last.frame_bytes === 300 - 4 * 64) // tail frame is short
    assert(frames.map(_.byte_offset).sorted.sameElements(Array(0L, 128L, 256L)))
  }

  test("frame sampling: deterministic hashes, identical payloads collide") {
    val p = "same payload bytes for both media items".getBytes("UTF-8")
    val media = Seq((1L, p), (2L, p.clone())).toDS()
    val frames = Multimodal.frameSample(media, frameSize = 16, stride = 1)
      .collect().groupBy(_.media_id)
    val h1 = frames(1L).sortBy(_.frame_idx).map(_.frame_hash).toSeq
    val h2 = frames(2L).sortBy(_.frame_idx).map(_.frame_hash).toSeq
    assert(h1 === h2)
  }

  test("driver query runs: every media item contributes frames") {
    val df = Multimodal.mmFrameSample(spark, sf)
    val nMedia = df.select($"media_id").distinct().count()
    assert(nMedia === Tables.documents(spark, sf).count())
  }

  test("frame features: unit-norm, deterministic, identical frames collide") {
    val p = "same payload bytes for both media items again".getBytes("UTF-8")
    val media = Seq((1L, p), (2L, p.clone())).toDS()
    val feats = Multimodal.frameFeatures(media, frameSize = 16, stride = 1, dim = 8)
      .collect().groupBy(_.media_id)
    // real-embedding contract: fixed dim, L2-normalized (plugs straight
    // into the cosine ANN family)
    feats.values.flatten.foreach { f =>
      assert(f.feature.length === 8)
      val n = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"feature not unit-norm: $n")
    }
    // identical payloads → identical features, frame by frame
    val f1 = feats(1L).sortBy(_.frame_idx).map(_.feature.toSeq).toSeq
    val f2 = feats(2L).sortBy(_.frame_idx).map(_.feature.toSeq).toSeq
    assert(f1 === f2)
    // and across independent runs (partition-invariant)
    val again = Multimodal.frameFeatures(media.repartition(3),
        frameSize = 16, stride = 1, dim = 8)
      .collect().filter(_.media_id == 1L).sortBy(_.frame_idx)
      .map(_.feature.toSeq).toSeq
    assert(again === f1)
    // components must center on ~0: a biased map (e.g. [-1, 3)) puts
    // every normalized vector in the positive orthant and unrelated
    // frames stop being cosine-discriminable
    val comps = feats.values.flatten.flatMap(_.feature).toSeq
    val mean = comps.map(_.toDouble).sum / comps.size
    assert(math.abs(mean) < 0.25, s"feature components biased: mean=$mean")
  }

  test("streaming scene cuts: replayed history lands on the batch rows, replays drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{SampledFrame, Multimodal => MM}
    // the full sampled-frame history of the sf corpus, in total frame
    // order — split MID-STREAM so per-media lag state must cross the
    // trigger boundary for parity to hold
    val all = MM.mmFrameSample(spark, sf).as[SampledFrame].collect()
    val (sliceA, sliceB) = all.splitAt(all.length / 2)
    val input = MemoryStream[SampledFrame](31, spark, None)
    val q = MM.sceneCutsStream(input.toDS())
      .writeStream.format("memory").queryName("cuts_out")
      .outputMode("append").start()
    try {
      input.addData(sliceA.toSeq: _*)
      q.processAllAvailable()
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      def streamed: Set[(Long, Int, Int, Int)] = spark.table("cuts_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSet
      val batch = MM.mmSceneCuts(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(batch.nonEmpty, "corpus produced no scene cuts — test is vacuous")
      val s1 = streamed
      assert(s1 === batch, "streamed cuts diverged from the batch operator")
      // at-least-once transport: a replayed slice must not re-emit cuts
      // (frames at or before the state's index drop)
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      assert(streamed === s1, "replayed frames re-emitted cuts")
    } finally q.stop()
  }

  test("streaming quality gate: verdicts at media close equal batch F16; replays and dup markers drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.MediaIngestEvent
    val MM = Multimodal
    val frames = MM.mmFrames(spark, sf)
      .select($"media_id", $"frame_idx", $"frame_hash").collect()
      .map(r => MediaIngestEvent(r.getLong(0), "frame", r.getInt(1),
        r.getLong(2), 0.0))
      .sortBy(_.idx)
    val audio = MM.mmAudioWindows(spark, sf, 64)
      .select($"media_id", $"window_idx", $"rms").collect()
      .map(r => MediaIngestEvent(r.getLong(0), "audio", r.getInt(1), 0L,
        r.getDouble(2)))
      .sortBy(_.idx)
    val markers = MM.mmManifest(spark, sf).select($"media_id").collect()
      .map(r => MediaIngestEvent(r.getLong(0), "end", Int.MaxValue, 0L, 0.0))
    val manifest = MM.mmManifest(spark, sf)
      .select($"media_id", $"duration_s").localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7))).toSet
    val batch = rows(MM.mmQualityGate(spark, sf))
    assert(batch.nonEmpty && batch.exists(_._8) && batch.exists(!_._8),
      "corpus gate verdicts vacuous")
    val input = MemoryStream[MediaIngestEvent](34, spark, None)
    val q = MM.qualityGateStream(input.toDS(), manifest)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      def streamed = rows(spark.table("gate_out"))
      // signals split across triggers (idx-sorted — the in-order
      // delivery contract), markers in the last trigger
      val (fa, fb) = frames.splitAt(frames.length / 2)
      val (aa, ab) = audio.splitAt(audio.length / 2)
      input.addData((fa ++ aa).toSeq: _*); q.processAllAvailable()
      assert(streamed.isEmpty, "gate emitted before any media closed")
      input.addData((fb ++ ab).toSeq: _*); q.processAllAvailable()
      input.addData(markers.toSeq: _*); q.processAllAvailable()
      assert(streamed === batch,
        "streamed gate verdicts diverged from batch F16")
      // post-close replays and duplicate markers are no-ops
      input.addData((frames ++ audio ++ markers).toSeq: _*)
      q.processAllAvailable()
      assert(streamed === batch, "closed media re-emitted or mutated")
    } finally q.stop()
  }

  test("streaming audio silence: replay matches batch, end markers flush open tails") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{AudioWindow, SilenceSpan}
    val MM = Multimodal
    val all = MM.mmAudioWindows(spark, sf, 64)
      .select($"media_id", $"window_idx", $"n_samples", $"energy", $"rms")
      .as[AudioWindow].collect()
    // global sort by window_idx keeps every media in-order ACROSS the
    // trigger split (the operator's delivery contract); runs split
    // mid-media exercise the carried open-run state
    val sortedAll = all.sortBy(w => (w.window_idx, w.media_id))
    val (sliceA, sliceB) = sortedAll.splitAt(sortedAll.length / 2)
    val input = MemoryStream[AudioWindow](32, spark, None)
    val q = MM.audioSilenceStream(input.toDS())
      .writeStream.format("memory").queryName("sil_out")
      .outputMode("append").start()
    try {
      input.addData(sliceA.toSeq: _*)
      q.processAllAvailable()
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      def streamed: Set[(Long, Int, Int, Long, Double)] = spark.table("sil_out")
        .as[SilenceSpan].collect()
        .map(s => (s.media_id, s.start_window, s.end_window, s.n_windows,
          s.span_rms)).toSet
      val batch = MM.mmAudioSilence(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(batch.nonEmpty, "corpus produced no silence spans — vacuous")
      // spans whose last window IS the media's last window are still
      // open at stream end — everything else must already match
      val maxIdx = all.groupBy(_.media_id)
        .map { case (m, ws) => m -> ws.map(_.window_idx).max }
      val openTails = batch.filter(s => s._3 == maxIdx(s._1))
      val s1 = streamed
      assert(s1 === batch -- openTails,
        "streamed closed spans diverged from the batch operator")
      // a replayed slice must not re-emit or corrupt runs (fence)
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      assert(streamed === s1, "replayed windows re-emitted spans")
      // end-of-media markers (the gateway's stream-closed event) flush
      // the open tails: parity becomes EXACT
      val markers = maxIdx.map { case (m, i) =>
        AudioWindow(m, i + 1, 1, 0L, 1e9) }.toSeq
      input.addData(markers: _*)
      q.processAllAvailable()
      assert(streamed === batch, "flushed spans diverged from batch")
    } finally q.stop()
  }

  test("resize: real byte loop matches the claimed ceil(n/4) geometry") {
    val rows = Multimodal.mmResize(spark, sf).collect()
    assert(rows.length.toLong === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (src, dst) = (r.getLong(5), r.getLong(6))
      assert(dst === (src + 3) / 4, s"resized length drifted: $src -> $dst")
      assert(r.getInt(3) === r.getInt(1) / 2 && r.getInt(4) === r.getInt(2) / 2)
    }
  }

  test("frame dedup: planted shared chunks pair up, boilerplate df-cap suppresses") {
    import spark.implicits._
    // 64-byte chunks; stride 4 samples frame 0, 4, ... — give each doc
    // 64*4 bytes so exactly chunks 0 and 4 are sampled (frame 4 is the
    // last, possibly short, chunk).
    val A = "a" * 256
    val B = "b" * 256
    def doc(id: Long, text: String) = (id, text.getBytes("UTF-8"))
    // payload = 5 chunks of 64 bytes → sampled frames at idx 0 and 4
    def payload(c0: String, c4: String) = c0 * 4 + c4
    val common = "z" * 64 // boilerplate chunk planted in MANY media
    val media = Seq(
      doc(1L, payload("a" * 64, "x" * 64)),
      doc(2L, payload("a" * 64, "x" * 64)), // exact same two sampled frames as 1
      doc(3L, payload("a" * 64, "y" * 64)), // shares only frame 0 with 1,2
      // four media sharing ONLY the boilerplate chunk (df = 5 > dfCap 4)
      doc(4L, payload(common, "p" * 64)),
      doc(5L, payload(common, "q" * 64)),
      doc(6L, payload(common, "r" * 64)),
      doc(7L, payload(common, "s" * 64)),
      doc(8L, payload(common, "t" * 64))
    ).toDF("doc_id", "payload").as[(Long, Array[Byte])]
    val frames = Multimodal.frameSample(media).toDF()
    val out = Multimodal.dedupFrames(frames, minShared = 2, dfCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5)))
    // only (1,2) share >= 2 non-boilerplate frames; containment = 2/2
    assert(out.toSeq === Seq((1L, 2L, 2L, 1.0)), s"pairs: ${out.toSeq}")
    // with the df-cap lifted the boilerplate chunk floods pairs
    val flooded = Multimodal.dedupFrames(frames, minShared = 1, dfCap = 64)
      .collect()
    assert(flooded.length >= 10, "df-cap test is vacuous: no boilerplate pairs")
  }

  test("audio levels: window math exact on a known payload, RMS consistent") {
    val a = new Multimodal.StubAudioAnalyzer(4)
    // bytes 128+x center to x; window 4 with a 2-sample tail
    val payload = Array[Byte](
      (128 + 3).toByte, (128 - 4).toByte, 128.toByte, (128 + 1).toByte,
      (128 - 2).toByte, (128 + 2).toByte)
    val out = a.analyze(payload).toSeq
    assert(out === Seq((0, 4, 4, (9 + 16 + 0 + 1).toLong), (1, 2, 2, 8L)))
    // driver query: covers every document, RMS² * n == energy
    val rows = Multimodal.mmAudioLevels(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length.toLong ===
      Tables.documents(spark, sf).filter(length($"text") > 0).count())
    rows.foreach { r =>
      val (n, peak, energy, rms) =
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5))
      assert(n >= 1 && peak >= 0 && peak <= 128)
      assert(math.abs(rms * rms * n - energy) < 1e-6 * math.max(1L, energy))
      assert(peak.toLong * peak >= energy / n, "peak below mean square")
    }
  }

  test("shots: cuts tile media into contiguous spans, keyframe is the first frame") {
    // 0 → 0 (no cut), 0 → 0xFFFFF (20 bits, cut), 0xFFFFF → 0xFFFFF
    val frames = Seq(
      (1L, 0, 0L), (1L, 1, 0L), (1L, 2, 0xFFFFFL), (1L, 3, 0xFFFFFL),
      (2L, 0, 42L),
    ).toDF("media_id", "frame_idx", "frame_hash")
    val out = Multimodal.shots(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 0L, 0, 1, 2L, 0L), (1L, 1L, 2, 3, 2L, 0xFFFFFL),
      (2L, 0L, 0, 0, 1L, 42L)), s"shots: ${out.toSeq}")
    // shots tile: per media, spans are contiguous and cover every frame
    out.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._4 + 1, "gap between shots")
        case _ =>
      }
    }
    // sf pipeline: shot count per media = cuts + 1, frames conserved
    val sfFrames = Multimodal.mmFrameSample(spark, sf)
    val nFrames = sfFrames.count()
    val sfShots = Multimodal.shots(sfFrames)
    assert(sfShots.agg(sum($"n_frames")).head.getLong(0) === nFrames,
      "frames lost or duplicated by shot tiling")
    val cutCount = Multimodal.sceneCuts(sfFrames).count()
    val mediaCount = sfFrames.select($"media_id").distinct().count()
    assert(sfShots.count() === cutCount + mediaCount,
      "shot count != cuts + media")
  }

  test("audio silence: islands merge, loud windows split, span rms from exact sums") {
    val levels = Seq(
      // media 1: silent 0-1, loud 2, silent 3-5
      (1L, 0, 64, 4, 640L, 3.16), (1L, 1, 64, 4, 1280L, 4.47),
      (1L, 2, 64, 100, 640000L, 100.0),
      (1L, 3, 64, 4, 640L, 3.16), (1L, 4, 64, 4, 640L, 3.16),
      (1L, 5, 32, 4, 320L, 3.16),
      // media 2: all loud → no spans
      (2L, 0, 64, 100, 640000L, 100.0),
    ).toDF("media_id", "window_idx", "n_samples", "peak", "energy", "rms")
    val out = Multimodal.audioSilence(levels, rmsThreshold = 10.0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq ===
      Seq((1L, 0, 1, 2L), (1L, 3, 5, 3L)), s"spans: ${out.toSeq}")
    // span rms from exact integer sums: sqrt((640+1280)/128)
    assert(math.abs(out.head._5 - math.sqrt(1920.0 / 128.0)) < 1e-12)
    assert(math.abs(out(1)._5 - math.sqrt(1600.0 / 160.0)) < 1e-12)
  }

  test("thumbnails: one poster per media, from a longest shot, keyframe consistent") {
    val thumbs = Multimodal.mmThumbnails(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toMap
    val shots = Multimodal.mmShots(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(4),
        r.getLong(5)))
    val byMedia = shots.groupBy(_._1)
    assert(thumbs.keySet === byMedia.keySet, "a media lost its poster")
    thumbs.foreach { case (m, (shotId, startF, nF, key)) =>
      val ms = byMedia(m)
      val maxLen = ms.map(_._4).max
      assert(nF === maxLen, s"media $m picked a non-longest shot")
      // earliest among the longest
      assert(shotId === ms.filter(_._4 == maxLen).map(_._2).min,
        s"media $m tie-break broken")
      val shot = ms.find(_._2 == shotId).get
      assert(startF === shot._3 && key === shot._5,
        s"media $m keyframe/start drifted from the shot row")
    }
  }

  test("streaming clips: parity with uncapped batch selection, markers flush, replays drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{SampledFrame, TrainingClip, Multimodal => MM}
    val all = MM.mmFrameSample(spark, sf).as[SampledFrame].collect()
    val (sliceA, sliceB) = all.splitAt(all.length / 2)
    // end-of-media markers: one sentinel frame per media past its last
    // index (frame_bytes < 0 — the gateway's stream-closed event)
    val markers = all.groupBy(_.media_id).map { case (m, fs) =>
      SampledFrame(m, fs.map(_.frame_idx).max + 1, 0L, -1, 0L)
    }.toSeq
    val input = MemoryStream[SampledFrame](33, spark, None)
    val q = MM.clipStream(input.toDS(), clipLen = 8, minFrames = 1)
      .writeStream.format("memory").queryName("clips_out")
      .outputMode("append").start()
    try {
      input.addData(sliceA.toSeq: _*)
      q.processAllAvailable()
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      def streamed: Set[(Long, Long, Int, Int)] = spark.table("clips_out")
        .as[TrainingClip].collect()
        .map(c => (c.media_id, c.shot_id, c.clip_start, c.clip_len)).toSet
      // the batch selection UNCAPPED (the stream's stated contract:
      // longest-first capping is a completed-media choice)
      val batch = MM.trainingClipsOf(
          MM.shots(MM.mmFrameSample(spark, sf)), clipLen = 8,
          minFrames = 1, maxClipsPerMedia = 1000000).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
      assert(batch.nonEmpty, "corpus produced no clips — vacuous")
      val beforeFlush = streamed
      // every emitted clip is a batch clip; only open tails are missing
      assert(beforeFlush.subsetOf(batch),
        "stream emitted a clip batch segmentation does not contain")
      input.addData(markers: _*)
      q.processAllAvailable()
      assert(streamed === batch,
        "flushed stream diverged from uncapped batch clips")
      // at-least-once: a replayed slice re-emits nothing
      val flushed = streamed
      input.addData(sliceB.toSeq: _*)
      q.processAllAvailable()
      assert(streamed === flushed, "replayed frames re-emitted clips")
    } finally q.stop()
  }

  test("training clips: min-length filter, longest-first cap, tie to earliest shot") {
    val sh = Seq(
      // media 1: lengths 10, 2, 6, 3, 5, 7 — minFrames=4 keeps
      // {10, 6, 5, 7}, cap 3 keeps {10, 7, 6}, output in shot order
      (1L, 0L, 0, 9, 10L, 111L), (1L, 1L, 10, 11, 2L, 222L),
      (1L, 2L, 12, 17, 6L, 333L), (1L, 3L, 18, 20, 3L, 444L),
      (1L, 4L, 21, 25, 5L, 555L), (1L, 5L, 26, 32, 7L, 666L),
      // media 2: all one-frame shots — fully filtered
      (2L, 0L, 0, 0, 1L, 1L), (2L, 1L, 1, 1, 1L, 2L),
      // media 3: two equal-length shots beyond the cap=3 — all kept
      (3L, 0L, 0, 4, 5L, 7L), (3L, 1L, 5, 9, 5L, 8L))
      .toDF("media_id", "shot_id", "start_frame", "end_frame",
        "n_frames", "keyframe_hash")
    val out = Multimodal.trainingClipsOf(sh, clipLen = 8, minFrames = 4,
        maxClipsPerMedia = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out.filter(_._1 == 2L).isEmpty, "one-frame shots not filtered")
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 0, 8), (1L, 2L, 12, 6), (1L, 5L, 26, 7)),
      s"media 1 clips: ${out.toSeq}")
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 0L, 0, 5), (3L, 1L, 5, 5)), s"media 3 clips: ${out.toSeq}")
  }

  test("quality gate: verdicts consistent with their own reported signals") {
    val out = Multimodal.mmQualityGate(spark, sf).collect()
    assert(out.length == 500, "every media gets a verdict row")
    out.foreach { r =>
      val (dur, motion, silent) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (dOk, mOk, aOk, passed) =
        (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))
      assert(dOk == (dur >= 2.0 && dur <= 600.0))
      assert(mOk == (motion >= 5.0))
      assert(aOk == (silent <= 0.5))
      assert(passed == (dOk && mOk && aOk))
      assert(silent >= 0.0 && silent <= 1.0)
    }
    // the gate discriminates on this corpus: both verdicts occur
    assert(out.exists(_.getBoolean(7)) && out.exists(!_.getBoolean(7)),
      "gate degenerate — all pass or all fail")
  }

  test("silence trim: planted edge runs trim, interior silence survives, all-silent zeros") {
    // threshold 44 → silent ⟺ energy < 1936·n. n = 4 per window here.
    val loud = 4L * 50 * 50   // rms 50 ≥ 44
    val quiet = 4L * 10 * 10  // rms 10 < 44
    val w = Seq(
      // media 1: [q, q, L, q, L, q] → lead 2, tail 1, kept 3
      (1L, 0, 4, 10, quiet), (1L, 1, 4, 10, quiet), (1L, 2, 4, 50, loud),
      (1L, 3, 4, 10, quiet), (1L, 4, 4, 50, loud), (1L, 5, 4, 10, quiet),
      // media 2: all silent → kept 0, lead = total, tail 0
      (2L, 0, 4, 10, quiet), (2L, 1, 4, 10, quiet),
      // media 3: all loud → nothing trimmed
      (3L, 0, 4, 50, loud), (3L, 1, 4, 50, loud))
      .toDF("media_id", "window_idx", "n_samples", "peak", "energy")
    val out = Multimodal.mmSilenceTrimOf(w).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5)))).toMap
    assert(out(1L) === ((2, 1, 3, 0.5)))
    assert(out(2L) === ((2, 0, 0, 0.0)))
    assert(out(3L) === ((0, 0, 2, 1.0)))
    // driver query: trims partition the window count when anything is kept
    Multimodal.mmSilenceTrim(spark, sf).collect().foreach { r =>
      val (total, lead, tail, kept) =
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))
      if (kept > 0) assert(lead + kept + tail === total)
      else assert(lead === total && tail === 0)
    }
  }

  test("loudness norm: exact clip count at the planted gain, gain*rms hits target") {
    // media 1: track rms = sqrt((3600+400)/8) ≈ 22.36 → gain ≈ 2.68;
    // window 0 peak 60: 60·gain > 127 clips; window 1 peak 10 does not.
    val w = Seq(
      (1L, 0, 4, 60, 4L * 30 * 30), (1L, 1, 4, 10, 4L * 10 * 10),
      // media 2: silent-ish uniform track, nothing clips at gain → 127/peak
      (2L, 0, 4, 20, 4L * 20 * 20), (2L, 1, 4, 20, 4L * 20 * 20))
      .toDF("media_id", "window_idx", "n_samples", "peak", "energy")
    val out = Multimodal.mmLoudnessNormOf(w, targetRms = 60).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(4) === 1L, "exactly the peak-60 window clips")
    // reported gain is target/rms at round-6
    val rms1 = math.sqrt((3600.0 + 400.0) / 8)
    assert(math.abs(r1.getDouble(2) - BigDecimal(rms1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val r2 = out(2L)
    assert(r2.getLong(4) === 0L, "uniform track below clip at target gain")
    assert(math.abs(r2.getDouble(3) * 20.0 - 60.0) < 1e-4,
      "gain × rms lands on target")
    // driver query: every audible media gets a row, fracs in [0,1]
    Multimodal.mmLoudnessNorm(spark, sf).collect().foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("media duplicate groups: transitive chain resolves to one rep, singletons keep themselves") {
    // 1-2 share {100,101}; 2-3 share {200,201}; 1-3 share NOTHING —
    // pairwise keep-min would leave 3 pointing at 2; the component
    // must pull the whole chain to rep 1
    val frames = Seq(
      (1L, 100L), (1L, 101L), (1L, 102L),
      (2L, 100L), (2L, 101L), (2L, 200L), (2L, 201L),
      (3L, 200L), (3L, 201L), (3L, 300L),
      (4L, 400L), (4L, 401L))
      .toDF("media_id", "frame_hash")
    val ids = Seq(1L, 2L, 3L, 4L).toDF("media_id")
    val out = Multimodal.mmDedupMediaGroupsOf(frames, ids).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out === Map(
      1L -> ((1L, false)), 2L -> ((1L, true)),
      3L -> ((1L, true)), 4L -> ((4L, false))), s"groups: $out")
  }

  test("mm frame search: ranks dense per query frame, no same-media hits, scores ordered, deterministic") {
    val rows = Multimodal.mmFrameSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty, "no query frames at driver SF")
    rows.groupBy(t => (t._1, t._2)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.length),
        s"ranks not dense for $q")
      val cs = sorted.map(_._6)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"cos not non-increasing for $q: ${cs.toSeq}")
      assert(rs.forall(_._4 != q._1), s"same-media hit for $q")
      assert(sorted.length <= 3, s"more than k hits for $q")
    }
    // every query media contributed every one of its frames as queries
    val qm = rows.map(_._1).distinct.sorted
    assert(qm.forall(_ % 50 == 0), s"non-sampled query media: ${qm.toSeq}")
    val again = Multimodal.mmFrameSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    assert(rows.toSeq === again.toSeq, "frame search not deterministic")
  }

  test("mm topk escalate: exact within candidates, full oversample recovers truth, recall row honest") {
    val k = 5
    val esc = Multimodal.mmTopkEscalate(spark, sf, k).collect()
    assert(esc.length === k)
    assert(esc.map(_.getInt(0)).toSeq === (1 to k), s"ranks: ${esc.toSeq}")
    // the deep scores are monotone down the ranking
    val scores = esc.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"deep ranking not monotone: ${scores.toSeq}")
    // answers come only from the proxy's candidate slice
    val candIds = Multimodal.mmManifest(spark, sf)
      .selectExpr("media_id", "duration_s p")
      .orderBy(org.apache.spark.sql.functions.col("p").desc,
        org.apache.spark.sql.functions.col("media_id"))
      .limit(k * 4).collect().map(_.getLong(0)).toSet
    esc.foreach(r => assert(candIds.contains(r.getLong(1)),
      s"answer outside the candidate slice: $r"))
    // an oversample spanning the corpus makes escalation EXACT
    val n = Tables.documents(spark, sf).count().toInt
    val full = Multimodal.mmTopkEscalateRecall(spark, sf, k,
      oversample = n / k + 1).head()
    assert(full.getInt(2) === k && full.getDouble(3) === 1.0,
      s"full-candidate escalation must recover truth: $full")
    // the honest-recall row at the default budget: consistent fields
    val r = Multimodal.mmTopkEscalateRecall(spark, sf, k).head()
    assert(r.getInt(0) === k && r.getInt(2) >= 0 && r.getInt(2) <= k)
    assert(r.getDouble(3) === math.rint(r.getInt(2).toDouble / k * 1e6) / 1e6)
    // deterministic replay
    val again = Multimodal.mmTopkEscalate(spark, sf, k).collect()
    assert(esc.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("mm frame search ivf: served scale path recalls the brute top-k, no same-media hits, deterministic") {
    def sets(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(3), r.getInt(4)))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val brute = sets(Multimodal.mmFrameSearch(spark, sf).collect())
    val ivf = Multimodal.mmFrameSearchIvf(spark, sf).collect()
    val ivfSets = sets(ivf)
    assert(ivfSets.keySet === brute.keySet, "query frame sets differ")
    val (hit, base) = brute.toSeq.map { case (q, b) =>
      (b.intersect(ivfSets(q)).size, b.size) }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val recall = hit.toDouble / base
    // probe-geometry floor on the near-uniform synthetic features —
    // the honest-baseline rule: chance for a 3-of-800 set is ~0.004
    assert(recall >= 0.7, f"ivf frame-search recall $recall%.3f < 0.7")
    ivf.foreach(r => assert(r.getLong(3) != r.getLong(0),
      s"same-media hit: $r"))
    val again = Multimodal.mmFrameSearchIvf(spark, sf).collect()
      .map(_.toString)
    assert(ivf.map(_.toString).toSeq === again.toSeq,
      "ivf frame search not deterministic")
  }

  test("av sync: planted offsets recovered exactly, still media dropped, deterministic") {
    // 32-byte blocks: the first 8 bytes drive MOTION (the operator's
    // 8-byte frames keep idx%4==0 = each block's head), the other 24
    // drive AUDIO energy. A/B heads are permutations of one byte
    // multiset — identical energy, different FNV hash — so switching
    // A<->B moves the motion series without touching loudness, and
    // loud tails move loudness without touching motion: the two
    // modalities are INDEPENDENTLY plantable.
    val headA = "~\u007f" * 4        // 8 bytes, energy 4*(4+1)
    val headB = "\u007f~" * 4        // same multiset, other order
    val quiet = "\u007f" * 24        // tail energy 24
    val loud = "(" * 24           // (40-128)^2 * 24
    val events = Set(3, 7, 11, 15)        // switch-and-loud schedule
    def doc(lagShift: Int): String =
      (0 until 20).map { t =>
        val nSwitches = events.count(_ <= t)
        val head = if (nSwitches % 2 == 0) headA else headB
        val tail = if (events.contains(t - lagShift)) loud else quiet
        head + tail
      }.mkString
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-avsync").toString
    Seq((1L, doc(0)), (2L, doc(2)), (3L, headA + quiet))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Multimodal.mmAvSync(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // doc 1: audio tracks motion exactly -> lag 0, perfect correlation
    assert(out(1L) === ((0, 1.0)), s"tracking media: $out")
    // doc 2: loudness shifted two blocks later -> lag +2 recovered
    assert(out(2L) === ((2, 1.0)), s"delayed media: $out")
    // doc 3: one block — no variance on either series -> dropped
    assert(!out.contains(3L), s"still media must be dropped: $out")
    val again = Multimodal.mmAvSync(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(again === out, "av sync not deterministic")
  }

  test("fragment gaps: interior and head gaps reported, gapless stream silent, driver gaps match the planted drop rule") {
    // media 1: fragments 0,1,4,5 -> one interior gap (1,4) missing 2;
    // media 2: first delivered fragment is 3 -> HEAD gap vs virtual -1;
    // media 3: contiguous -> no rows
    val frags = Seq((1L, 0L), (1L, 1L), (1L, 4L), (1L, 5L),
      (2L, 3L), (2L, 4L), (3L, 0L), (3L, 1L))
      .toDF("media_id", "frag")
    val out = Multimodal.mmFragmentGapsOf(frags).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 1L, 4L, 2L), (2L, -1L, 3L, 3L)),
      s"gap rows: ${out.toSeq}")
    // driver entry: every reported gap's interior fragments violate
    // the planted keep rule, and the count column is the gap width
    val drv = Multimodal.mmFragmentGaps(spark, sf).collect()
    assert(drv.nonEmpty, "planted ~6% loss must surface gaps")
    drv.foreach { r =>
      val (m, s, e, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(e - s - 1 === n, s"width: $r")
      ((s + 1) until e).foreach(i =>
        assert((m * 31 + i) % 17 === 0,
          s"fragment $i of media $m reported missing but passes " +
            "the drop rule"))
    }
  }

  test("fragment loss: silent stream reads loss 1.0, partial and full delivery priced exactly") {
    val expected = Seq((1L, 4L), (2L, 5L), (3L, 3L))
      .toDF("media_id", "n_frags")
    // media 1 delivered 0,1,3 (lost 1 of 4); media 2 everything;
    // media 3 NOTHING — silence must still report, at loss 1.0
    val frags = Seq((1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 0L), (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L))
      .toDF("media_id", "frag")
    val out = Multimodal.mmFragmentLossOf(frags, expected).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out(1L) === ((3L, 1L, 0.25)), s"partial: ${out(1L)}")
    assert(out(2L) === ((5L, 0L, 0.0)), s"full: ${out(2L)}")
    assert(out(3L) === ((0L, 3L, 1.0)), s"silent: ${out(3L)}")
    // driver entry: loss share consistent with the F26 gap rows' mass
    val loss = Multimodal.mmFragmentLoss(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val gapMass = Multimodal.mmFragmentGaps(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sum)
    gapMass.foreach { case (m, miss) =>
      // interior+head gaps account for every missing fragment except
      // a truncated TAIL (the drop rule can remove the last fragment,
      // which no adjacent-pair gap sees) — loss >= gap mass, and any
      // excess is at most one trailing fragment per stream here
      assert(loss(m) >= miss && loss(m) - miss <= 1,
        s"media $m: loss ${loss(m)} vs gap mass $miss") }
  }

  test("fragment gaps stream: replayed history lands on the batch gap rows, duplicate fragments drop, late head gap pages") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{FragmentEvent, FragmentGap}
    val history = Seq((1L, 0L), (1L, 1L), (1L, 4L), (1L, 5L),
      (2L, 3L), (2L, 4L), (3L, 0L), (3L, 1L))
    val batch = Multimodal.mmFragmentGapsOf(
        history.toDF("media_id", "frag")).collect()
      .map(r => FragmentGap(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val input = MemoryStream[FragmentEvent](210, spark, None)
    val q = Multimodal.fragmentGapsStream(input.toDS())
      .writeStream.format("memory").queryName("frag_gaps_stream")
      .outputMode("append").start()
    try {
      // two triggers split mid-stream, with a replayed duplicate in
      // the second — state must carry fragment order across the cut
      input.addData(history.take(4).map(t => FragmentEvent(t._1, t._2)))
      q.processAllAvailable()
      input.addData((history.drop(4) :+ ((1L, 4L)))
        .map(t => FragmentEvent(t._1, t._2)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("frag_gaps_stream").collect()
      .map(r => FragmentGap(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed === batch,
      s"stream gaps $streamed != batch gaps $batch")
  }

  test("buffered fragment gaps: cross-trigger disorder within the watermark folds in order — exact gaps where F26b would misreport") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{TimedFragmentEvent, FragmentGap}
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[TimedFragmentEvent](211, spark, None)
    val q = Multimodal.fragmentGapsStreamBuffered(input.toDS(),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("frag_gaps_buffered")
      .outputMode("append").start()
    try {
      // trigger 1: frags 0, 1, 5 — frag 3 is STILL IN FLIGHT. The
      // unbuffered F26b would emit gap 1->5 here and drop the late 3.
      input.addData(Seq(TimedFragmentEvent(1L, at(0), 0L),
        TimedFragmentEvent(1L, at(1), 1L),
        TimedFragmentEvent(1L, at(5), 5L)))
      q.processAllAvailable()
      // trigger 2: the late frag 3 (event time BEFORE 5's), plus a
      // watermark-advancing frag 6 at minute 25 -> watermark 15:00
      input.addData(Seq(TimedFragmentEvent(1L, at(3), 3L),
        TimedFragmentEvent(1L, at(25), 6L)))
      q.processAllAvailable()
      // trigger 3: advance the watermark past 6 so the tail flushes,
      // with a replay of the already-folded frag 3 (must drop)
      input.addData(Seq(TimedFragmentEvent(1L, at(3), 3L),
        TimedFragmentEvent(1L, at(55), 8L)))
      q.processAllAvailable()
      // advance the watermark past frag 8's event time on a DIFFERENT
      // stream — media 1 goes quiet and the event-time timeout must
      // flush its tail without more media-1 data
      input.addData(Seq(TimedFragmentEvent(2L, at(59), 0L)))
      q.processAllAvailable()
      input.addData(Seq(TimedFragmentEvent(2L, java.sql.Timestamp
        .valueOf("2024-01-01 11:10:00"), 1L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("frag_gaps_buffered").collect()
      .map(r => FragmentGap(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // exact total-order gaps: 1->3 (missing 2), 3->5 (missing 4),
    // 6->8 (missing 7) — NOT the 1->5 misreport, and no retraction rows
    val want = Set(FragmentGap(1L, 1L, 3L, 1L), FragmentGap(1L, 3L, 5L, 1L),
      FragmentGap(1L, 6L, 8L, 1L))
    assert(got === want, s"buffered gaps $got != exact $want")
  }

  test("mm pack: hand-computed mixed-modality costs and slots") {
    val docs = Seq(
      (0L, "one two three"), // 3 tok, 0 images
      (1L, Seq.fill(10)("w").mkString(" ")), // 10 tok, 1×480x360 image
      (2L, "a b c d e"), // 5 tok, 2×640x480 images
      (3L, "p q r s")) // 4 tok, 0 images
      .toDF("doc_id", "text")
    val got = Multimodal.mmPackInterleavedOf(docs, seqLen = 1024, g = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getBoolean(9))).toList
    // image cost: 480x360/16 → 30*23 patches + 2 = 692;
    //             640x480/16 → 40*30 + 2 = 1202 each
    // doc0: 3 tok → bucket 128 rnk1 → seq(128,0) slot 0, pad 125
    // doc3: 4 tok → bucket 128 rnk2 → seq(128,0) slot 1, pad 124
    // doc1: 10+692=702 → bucket 768 (cap 1) → seq(768,0), pad 66
    // doc2: 5+2404=2409 > 1024 → bucket 1024, truncated, pad 0
    val want = List(
      (0L, 3L, 0L, 0L, 3L, 128L, 0L, 0L, 125L, false),
      (1L, 10L, 1L, 692L, 702L, 768L, 0L, 0L, 66L, false),
      (2L, 5L, 2L, 2404L, 2409L, 1024L, 0L, 0L, 0L, true),
      (3L, 4L, 0L, 0L, 4L, 128L, 0L, 1L, 124L, false))
    assert(got === want, s"mm pack $got != $want")
  }

  test("mm pack report: exact token accounting per sequence") {
    val seqLen = 8192
    val rep = Multimodal.mmPackReport(spark, sf, seqLen).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (used, pad, tailGap, alignGap) =
        (r.getLong(5), r.getLong(6), r.getLong(8), r.getLong(9))
      assert(used + pad + tailGap + alignGap === seqLen.toLong,
        s"seq (${r.getLong(0)},${r.getLong(1)}): " +
          s"$used + $pad + $tailGap + $alignGap != $seqLen")
    }
    // the report is a partition of the packed corpus: doc and image
    // token masses reconcile exactly against the per-doc frame
    val packed = Multimodal.mmPackInterleaved(spark, sf, seqLen)
    assert(rep.map(_.getLong(2)).sum === packed.count())
    assert(rep.map(_.getLong(4)).sum ===
      packed.agg(sum($"image_tokens")).head().getLong(0))
  }

  test("mm pack adaptive: ladder picks first fitting rung, downsample audited, text-only never downsamples") {
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")), // 1×480x360: 702 fits at p16
      (2L, "a b c d e"), // 2×640x480: 2409 > 2048 → p32: 5+604=609
      (3L, Seq.fill(3000)("w").mkString(" ")) // text-only, overflows every rung
    ).toDF("doc_id", "text")
    val got = Multimodal.mmPackAdaptiveOf(docs, seqLen = 2048, g = 128)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getInt(4),
        r.getBoolean(5), r.getLong(6), r.getBoolean(11)))).toMap
    // (image_tokens, patch_used, downsampled, n_tokens, truncated)
    assert(got(1L) === ((692L, 16, false, 702L, false)))
    assert(got(2L) === ((604L, 32, true, 609L, false)))
    assert(got(3L) === ((0L, 64, false, 3000L, true)))
  }

  test("mm pack certified: sequences whole per shard, manifest verified, re-call idempotent") {
    val m1 = Multimodal.mmPackCertified(spark, sf).collect()
    assert(m1.nonEmpty && m1.length <= 8)
    // the verify pass ran inside the call; the manifest accounts every
    // packed row exactly once
    assert(m1.map(_.getLong(1)).sum ===
      Multimodal.mmPackInterleaved(spark, sf).count())
    // whole-sequence-per-file: no (bucket, seq_in_bucket) spans shards
    val dir = mmCertDir.getOrElse(fail("shard dir not staged"))
    val spanning = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy($"bucket", $"seq_in_bucket")
      .agg(countDistinct($"f").as("nf"))
      .filter($"nf" > 1).count()
    assert(spanning === 0L, "a sequence spans shard files")
    // second call re-verifies the SAME staged artifact bit-for-bit
    val m2 = Multimodal.mmPackCertified(spark, sf).collect()
    assert(m2.map(_.toString).toSeq === m1.map(_.toString).toSeq)
  }

  private def mmCertDir: Option[String] =
    Multimodal.mmShardDirCache.values.headOption

  test("mm data card: inventory reconciles, gauges bounded, means only over measured media") {
    val card = Multimodal.mmDataCard(spark, sf).collect()
    assert(card.nonEmpty)
    assert(card.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf).count())
    card.foreach { r =>
      val (nMedia, share) = (r.getLong(1), r.getDouble(5))
      val (nLoss, nSilent) = (r.getLong(6), r.getLong(8))
      val (nSync, nInSync) = (r.getLong(9), r.getLong(10))
      assert(share > 0.0 && share <= 1.0)
      assert(nSilent <= nLoss && nLoss <= nMedia)
      assert(nInSync <= nSync && nSync <= nMedia)
      // a mean exists iff something was measured — never a fabricated 0
      assert(r.isNullAt(7) === (nLoss == 0L))
    }
    // the loss mean reconciles against the per-media F26c frame
    import spark.implicits._
    val src = card.head.getString(0)
    val perMedia = Multimodal.mmFragmentLoss(spark, sf)
      .join(Multimodal.mmManifest(spark, sf).select($"media_id", $"source"),
        Seq("media_id"))
      .filter($"source" === src).select($"loss_share").collect()
      .map(_.getDouble(0))
    // exact replay of the card's arithmetic: decimal(18,6) per-media
    // values, exact sum, one IEEE division, Spark's HALF_UP round(6)
    val mean = perMedia.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / perMedia.length
    val want = BigDecimal(java.lang.Double.toString(mean))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(card.head.getDouble(7) === want,
      s"card mean ${card.head.getDouble(7)} != recomputed $want")
  }

  test("mm pack: cost model composes text + images, zero-image docs text-only") {
    val rows = Multimodal.mmPackInterleaved(spark, sf).collect()
    rows.foreach { r =>
      val (id, text, img, total) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(text + img === total)
      if (id % 3 == 0) assert(img === 0L) else assert(img > 0L)
    }
  }
}
