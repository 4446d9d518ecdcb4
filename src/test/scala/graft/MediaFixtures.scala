package graft

/** Shared byte-assembly primitives for the container-demux fixtures
  * (MultimodalSpec, DemuxPropertySpec) — one copy of the ISO-BMFF box and
  * EBML element encoders, so a change to a size encoding can't silently
  * diverge between the unit and property suites.
  */
object MediaFixtures {

  def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** ISO-BMFF box: 32-bit size + 4-char type + content. */
  def bmffBox(typ: String, content: Array[Byte]*): Array[Byte] = {
    val c = content.flatten.toArray
    be32(c.length + 8) ++ typ.getBytes("ISO-8859-1") ++ c
  }

  def ebmlId(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  /** EBML element with a fixed 2-byte size encoding (0x40 marker). */
  def ebmlEl(eid: Array[Byte], content: Array[Byte]*): Array[Byte] = {
    val c = content.flatten.toArray
    require(c.length < (1 << 14))
    eid ++ Array((0x40 | (c.length >> 8)).toByte, (c.length & 0xFF).toByte) ++ c
  }

  /** Matroska block payload: 1-byte track varint, 16-bit relative
    * timestamp, flags byte, frame data.
    */
  def mkvBlockBytes(track: Int, flags: Int, data: Array[Byte]): Array[Byte] =
    Array((0x80 | track).toByte, 0.toByte, 0.toByte, flags.toByte) ++ data

  /** Fragmented MP4 (DASH/CMAF shape): ftyp + moov (tkhd track 1 'vide',
    * trex defaulting samples to NON-sync) + one moof/mdat pair per
    * fragment. Each fragment is a list of truns; each trun a list of
    * (payload, Option(sampleFlags)) — None relies on the resolution chain
    * (first-sample-flags / tfhd / trex). The first trun of a traf carries
    * an explicit data offset (default-base-is-moof addressing); later
    * truns omit it and must continue at the running cursor.
    */
  def fmp4Fixture(
      frags: Seq[Seq[Seq[(Array[Byte], Option[Int])]]],
      firstSampleFlags: Option[Int] = None): Array[Byte] = {
    val ftyp = bmffBox("ftyp", "isom".getBytes, be32(0))
    val tkhd = bmffBox("tkhd", be32(0), be32(0), be32(0), be32(1))
    val mdia = bmffBox("mdia", bmffBox("hdlr", be32(0), be32(0), "vide".getBytes))
    val trex = bmffBox("trex",
      be32(0), be32(1), be32(1), be32(0), be32(0), be32(0x10000)) // default: non-sync
    val moov = bmffBox("moov", bmffBox("trak", tkhd, mdia), bmffBox("mvex", trex))
    var out = ftyp ++ moov
    for (truns <- frags) {
      def trunBytes(samples: Seq[(Array[Byte], Option[Int])], dataOffset: Option[Int],
          withFirstFlags: Boolean): Array[Byte] = {
        val perFlags = samples.exists(_._2.isDefined)
        // once 0x400 is declared, EVERY sample record must carry the
        // 4-byte flags field — a mixed Some/None run would emit a trun
        // whose declared stride disagrees with its bytes
        require(!perFlags || samples.forall(_._2.isDefined),
          "fmp4Fixture: a trun mixing Some/None sample flags is malformed; " +
            "use all-Some or all-None within one run")
        val flags = (if (dataOffset.isDefined) 0x01 else 0) |
          (if (withFirstFlags) 0x04 else 0) | 0x200 | (if (perFlags) 0x400 else 0)
        bmffBox("trun", be32(flags), be32(samples.length),
          dataOffset.map(be32).getOrElse(Array.empty[Byte]),
          firstSampleFlags.filter(_ => withFirstFlags).map(be32).getOrElse(Array.empty[Byte]),
          samples.toArray.flatMap { case (d, f) =>
            be32(d.length) ++ f.map(be32).getOrElse(Array.empty[Byte])
          })
      }
      val tfhd = bmffBox("tfhd", be32(0x020000), be32(1)) // default-base-is-moof
      def moofFor(off: Int): Array[Byte] = bmffBox("moof",
        bmffBox("mfhd", be32(0), be32(1)),
        bmffBox("traf", tfhd +: truns.zipWithIndex.map { case (t, i) =>
          trunBytes(t, if (i == 0) Some(off) else None,
            withFirstFlags = i == 0 && firstSampleFlags.isDefined)
        }: _*))
      val moofLen = moofFor(0).length // length independent of the offset value
      val moof = moofFor(moofLen + 8) // mdat content starts just past its header
      val data = truns.flatten.flatMap(_._1).toArray
      out = out ++ moof ++ bmffBox("mdat", data)
    }
    out
  }
}
