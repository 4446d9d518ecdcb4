package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.llm.Multimodal

/** Property tests: the MP4 and WebM keyframe demuxers vs the planted
  * ground truth over GENERATED containers — random sample sizes, random
  * chunk groupings (exercising multi-run stsc expansion, which the unit
  * fixtures keep at one chunk), random keyframe subsets, random box
  * order, both chunk-offset widths, and random block/track mixes on the
  * EBML side. No Spark involved: the demuxers are plain byte functions.
  */
class DemuxPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def be32(v: Int): Array[Byte] = MediaFixtures.be32(v)

  private def box(typ: String, content: Array[Byte]*): Array[Byte] =
    MediaFixtures.bmffBox(typ, content: _*)

  /** Full-generality ISO-BMFF builder: per-sample sizes (stsz table),
    * arbitrary chunk grouping (stsc runs compressed from the per-chunk
    * counts), stco or co64, optional stss, mdat before or after moov.
    */
  private def mp4(samples: Seq[Array[Byte]], chunkSizes: Seq[Int],
      sync: Option[Seq[Int]], co64: Boolean, mdatLast: Boolean): Array[Byte] = {
    require(chunkSizes.sum == samples.length)
    val ftyp = box("ftyp", "isom".getBytes, be32(0))
    val mdat = box("mdat", samples.flatten.toArray)
    def moovFor(mdatContent: Int): Array[Byte] = {
      // chunk offsets: sequential within the mdat payload
      val perChunkLens = {
        var s = 0
        chunkSizes.map { n =>
          val len = samples.slice(s, s + n).map(_.length).sum; s += n; len
        }
      }
      val offsets = perChunkLens.scanLeft(mdatContent)(_ + _).init
      // compress per-chunk counts into (first_chunk, samples_per_chunk) runs
      val runs = chunkSizes.zipWithIndex.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (n, i)) =>
          if (acc.nonEmpty && acc.head._2 == n) acc else (i + 1, n) :: acc
      }.reverse
      val stsz = box("stsz", be32(0), be32(0), be32(samples.length),
        samples.toArray.flatMap(s => be32(s.length)))
      val stsc = box("stsc", be32(0), be32(runs.length),
        runs.toArray.flatMap { case (fc, n) => be32(fc) ++ be32(n) ++ be32(1) })
      val stco =
        if (co64) box("co64", be32(0), be32(offsets.length),
          offsets.toArray.flatMap(o => be32(0) ++ be32(o)))
        else box("stco", be32(0), be32(offsets.length), offsets.toArray.flatMap(be32))
      val stss = sync.fold(Array.empty[Byte])(s =>
        box("stss", be32(0), be32(s.length), s.toArray.flatMap(be32)))
      box("moov", box("trak", box("mdia",
        box("hdlr", be32(0), be32(0), "vide".getBytes),
        box("minf", box("stbl", stsz, stsc, stco, stss)))))
    }
    if (mdatLast) {
      val moovLen = moovFor(0).length
      ftyp ++ moovFor(ftyp.length + moovLen + 8) ++ mdat
    } else ftyp ++ mdat ++ moovFor(ftyp.length + 8)
  }

  private case class Mp4Case(samples: Seq[Array[Byte]], chunkSizes: Seq[Int],
      sync: Option[Seq[Int]], co64: Boolean, mdatLast: Boolean)

  private val mp4Gen: Gen[Mp4Case] = for {
    n <- Gen.choose(1, 12)
    samples <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 20)
      bytes <- Gen.listOfN(len, Gen.choose(0, 255))
    } yield bytes.map(_.toByte).toArray)
    chunkSizes <- {
      def splits(rem: Int): Gen[List[Int]] =
        if (rem == 0) Gen.const(Nil)
        else Gen.choose(1, rem).flatMap(k => splits(rem - k).map(k :: _))
      splits(n)
    }
    sync <- Gen.option(Gen.someOf(1 to n).map(_.toSeq.sorted))
    co64 <- Gen.oneOf(true, false)
    mdatLast <- Gen.oneOf(true, false)
  } yield Mp4Case(samples, chunkSizes, sync, co64, mdatLast)

  test("MP4 demux returns exactly the declared keyframes, any chunking/order/width") {
    for (seed <- 1L to 60L) {
      val c = sample(mp4Gen, seed)
      val payload = mp4(c.samples, c.chunkSizes, c.sync, c.co64, c.mdatLast)
      val expected = c.sync match {
        case None => c.samples                       // no stss = all sync
        case Some(s) => s.map(i => c.samples(i - 1)) // 1-based
      }
      val got = Multimodal.JvmCodecs.sampleFrames(seed, payload, n = expected.length max 1)
      if (expected.isEmpty) assert(got.isEmpty, s"seed=$seed: expected no keyframes")
      else assert(got.map(_.payload.toSeq) == expected.map(_.toSeq),
        s"seed=$seed chunks=${c.chunkSizes} sync=${c.sync} co64=${c.co64} last=${c.mdatLast}")
    }
  }

  // --- fragmented MP4 ---

  private val fmp4Gen: Gen[List[List[List[(Array[Byte], Option[Int])]]]] = for {
    nFrags <- Gen.choose(1, 3)
    frags <- Gen.listOfN(nFrags, for {
      nTruns <- Gen.choose(1, 3)
      truns <- Gen.listOfN(nTruns, for {
        nSamples <- Gen.choose(1, 5)
        samples <- Gen.listOfN(nSamples, for {
          len <- Gen.choose(1, 12)
          bytes <- Gen.listOfN(len, Gen.choose(0, 255))
          key <- Gen.oneOf(true, false)
        } yield (bytes.map(_.toByte).toArray,
          Some(if (key) 0 else 0x10000): Option[Int]))
      } yield samples)
    } yield truns)
  } yield frags

  test("fragmented MP4 demux returns exactly the sync samples, any fragmentation") {
    for (seed <- 1L to 60L) {
      val frags = sample(fmp4Gen, seed)
      val payload = MediaFixtures.fmp4Fixture(frags)
      val expected = frags.flatten.flatten
        .collect { case (d, Some(0)) => d }
      val got = Multimodal.JvmCodecs.sampleFrames(seed, payload,
        n = expected.length max 1)
      if (expected.isEmpty) assert(got.isEmpty, s"seed=$seed: expected no keyframes")
      else assert(got.map(_.payload.toSeq) == expected.map(_.toSeq),
        s"seed=$seed frags=${frags.map(_.map(_.length))}")
    }
  }

  // --- WebM ---

  private def id(bytes: Int*): Array[Byte] = MediaFixtures.ebmlId(bytes: _*)

  private def ebml(eid: Array[Byte], content: Array[Byte]*): Array[Byte] =
    MediaFixtures.ebmlEl(eid, content: _*)

  private case class Blk(track: Int, key: Boolean, group: Boolean, data: Array[Byte])

  private val webmGen: Gen[(List[Blk], Boolean)] = for {
    n <- Gen.choose(0, 10)
    blocks <- Gen.listOfN(n, for {
      track <- Gen.oneOf(1, 2) // 1 = video, 2 = audio
      key <- Gen.oneOf(true, false)
      group <- Gen.oneOf(true, false)
      len <- Gen.choose(1, 16)
      bytes <- Gen.listOfN(len, Gen.choose(0, 255))
    } yield Blk(track, key, group, bytes.map(_.toByte).toArray))
    unknownSize <- Gen.oneOf(true, false)
  } yield (blocks, unknownSize)

  test("WebM demux returns exactly the video keyframes, any block/track mix") {
    for (seed <- 1L to 60L) {
      val (blocks, unknownSize) = sample(webmGen, seed)
      def blockBytes(b: Blk, flags: Int): Array[Byte] =
        Array((0x80 | b.track).toByte, 0.toByte, 0.toByte, flags.toByte) ++ b.data
      val encoded = blocks.map { b =>
        if (!b.group) ebml(id(0xA3), blockBytes(b, if (b.key) 0x80 else 0x00))
        else if (b.key) ebml(id(0xA0), ebml(id(0xA1), blockBytes(b, 0)))
        else ebml(id(0xA0), ebml(id(0xA1), blockBytes(b, 0)),
          ebml(id(0xFB), Array(0x7F.toByte)))
      }
      val tracks = ebml(id(0x16, 0x54, 0xAE, 0x6B),
        ebml(id(0xAE), ebml(id(0xD7), Array(2.toByte)), ebml(id(0x83), Array(2.toByte))),
        ebml(id(0xAE), ebml(id(0xD7), Array(1.toByte)), ebml(id(0x83), Array(1.toByte))))
      val cluster = ebml(id(0x1F, 0x43, 0xB6, 0x75),
        (ebml(id(0xE7), Array(0.toByte)) :: encoded): _*)
      val segContent = tracks ++ cluster
      val payload = ebml(id(0x1A, 0x45, 0xDF, 0xA3)) ++ (
        if (unknownSize) id(0x18, 0x53, 0x80, 0x67) ++ Array(0xFF.toByte) ++ segContent
        else ebml(id(0x18, 0x53, 0x80, 0x67), segContent))
      val expected = blocks.filter(b => b.track == 1 && b.key).map(_.data)
      val got = Multimodal.JvmCodecs.sampleFrames(seed, payload, n = expected.length max 1)
      if (expected.isEmpty) assert(got.isEmpty, s"seed=$seed: expected no keyframes")
      else assert(got.map(_.payload.toSeq) == expected.map(_.toSeq),
        s"seed=$seed blocks=${blocks.map(b => (b.track, b.key, b.group))}")
    }
  }

  // --- audio elementary streams ---

  private def adtsFrame(dataLen: Int, fill: Byte): Array[Byte] = {
    val len = 7 + dataLen
    Array(0xFF, 0xF1, 0x50, 0x80 | ((len >> 11) & 3), (len >> 3) & 0xFF,
      ((len & 7) << 5) | 0x1F, 0xFC).map(_.toByte) ++ Array.fill(dataLen)(fill)
  }

  private def mp3Frame(brIx: Int, srIx: Int, pad: Int, fill: Byte): Array[Byte] = {
    val br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
      256, 320)(brIx) * 1000
    val sr = Array(44100, 48000, 32000)(srIx)
    val len = 144 * br / sr + pad
    Array(0xFF, 0xFB, (brIx << 4) | (srIx << 2) | (pad << 1), 0x00)
      .map(_.toByte) ++ Array.fill(len - 4)(fill)
  }

  private case class AudioCase(frames: List[Array[Byte]], id3Body: Option[Int],
      truncate: Int)

  private val audioGen: Gen[AudioCase] = for {
    isAdts <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 6)
    frames <- Gen.listOfN(n,
      if (isAdts) for {
        d <- Gen.choose(0, 20); f <- Gen.choose(0, 255)
      } yield adtsFrame(d, f.toByte)
      else for {
        br <- Gen.choose(1, 14); sr <- Gen.choose(0, 2)
        pad <- Gen.choose(0, 1); f <- Gen.choose(0, 255)
      } yield mp3Frame(br, sr, pad, f.toByte))
    id3 <- Gen.option(Gen.choose(0, 30))
    trunc <- Gen.oneOf(0, 0, 0, 1, 3) // usually whole; sometimes cut tail
  } yield AudioCase(frames, id3, trunc)

  test("audio frame walk returns exactly the planted ADTS/MP3 frames, " +
      "any ID3 prefix / truncated tail") {
    for (seed <- 1L to 60L) {
      val c = sample(audioGen, seed)
      val id3 = c.id3Body.fold(Array.empty[Byte]) { b =>
        Array[Byte]('I', 'D', '3', 4, 0, 0) ++
          Array(((b >> 21) & 0x7F), ((b >> 14) & 0x7F), ((b >> 7) & 0x7F),
            b & 0x7F).map(_.toByte) ++ Array.fill(b)(9.toByte)
      }
      val whole = id3 ++ c.frames.flatten.toArray
      val payload = whole.take(whole.length - c.truncate)
      // a truncated tail ends the walk at the valid prefix — frames whose
      // end survives the cut
      val expected = {
        var off = id3.length
        c.frames.takeWhile { f => off += f.length; off <= payload.length }
      }
      val got = Multimodal.JvmCodecs.sampleFrames(seed, payload,
        n = expected.length max 1)
      if (expected.nonEmpty)
        assert(got.map(_.payload.toSeq) == expected.map(_.toSeq),
          s"seed=$seed id3=${c.id3Body} trunc=${c.truncate} " +
            s"lens=${c.frames.map(_.length)}")
      else if (c.id3Body.isDefined)
        // ID3 is a strong magic: no walkable frame behind it → corrupt, Nil
        assert(got.isEmpty, s"seed=$seed: ID3 with no valid frame must be Nil")
      else
        // bare 2-byte sync is weak: unparseable payload keeps the stub
        // contract (deterministic slices), it does not vanish
        assert(got.map(_.payload.toSeq) ==
          Multimodal.StubCodecs.sampleFrames(seed, payload, n = 1)
            .map(_.payload.toSeq), s"seed=$seed: expected stub fallback")
    }
  }
}
