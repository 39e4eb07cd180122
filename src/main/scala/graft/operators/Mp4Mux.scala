package graft.operators

/** Minimal conformant ISO-BMFF / H.264-SPS writer — the mux twin of
  * [[Multimodal]]'s demux path (box walk `mp4VideoTrack`, Exp-Golomb
  * `spsDimensions`). Public-spec formats only: ISO/IEC 14496-12 (box
  * structure, sample tables), ISO/IEC 14496-15 §5.3.3 (avcC
  * configuration record), ITU-T H.264 §7.3.2.1.1 (sequence parameter
  * set). Two consumers: MultimodalSpec's container fixtures, and the
  * declared query `q151_avc_meta`, which muxes a real avc1 MP4 per
  * document (parameters derived from the doc id), parses it back
  * through the REAL demux + SPS bit-reader, and hash-matches the
  * recovered profile/level/dimensions against pure doc-id arithmetic in
  * the oracle — a bit-level round-trip gate on both the writer and the
  * parser. */
private[graft] object Mp4Mux {

  def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def box(t: String, data: Array[Byte]): Array[Byte] =
    be32(8 + data.length) ++ t.getBytes("US-ASCII") ++ data
  def full(t: String, data: Array[Byte]): Array[Byte] =
    box(t, be32(0) ++ data) // version 0, flags 0

  /** MSB-first bit writer for hand-crafting SPS bitstreams. */
  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var nb = 0
    def u(v: Int, n: Int): this.type = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        k -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      val vv = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(vv)
      u(0, len - 1); u(vv, len)
    }
    /** signed Exp-Golomb (§9.1.1): v>0 → ue(2v−1), v≤0 → ue(−2v). */
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** zero-pad to the next byte boundary (pcm_alignment_zero_bit). */
    def align(): this.type = {
      while (nb != 0) u(0, 1)
      this
    }
    def toBytes: Array[Byte] = {
      val b = buf.clone()
      if (nb > 0) b += (cur << (8 - nb)).toByte
      b.toArray
    }
  }

  /** Minimal conformant SPS NAL (ITU-T H.264 §7.3.2.1.1): profile 66 /
    * 77, or 100 (the high-profile chroma branch), poc type 0, optional
    * frame-cropping rectangle. */
  def spsNal(profile: Int, level: Int, widthMbs: Int, heightMapUnits: Int,
      frameMbsOnly: Int = 1,
      crop: (Int, Int, Int, Int) = (0, 0, 0, 0)): Array[Byte] = {
    val w = new BitWriter
    w.u(profile, 8).u(0, 8).u(level, 8)
    w.ue(0) // seq_parameter_set_id
    if (profile == 100) { // high-profile chroma branch
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(0).ue(0) // bit depths
      w.u(0, 1) // transform bypass
      w.u(0, 1) // no scaling matrix
    }
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0).ue(0) // poc type 0 + log2_max_poc_lsb
    w.ue(1) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num_value_allowed
    w.ue(widthMbs - 1).ue(heightMapUnits - 1)
    w.u(frameMbsOnly, 1)
    if (frameMbsOnly == 0) w.u(0, 1)
    w.u(1, 1) // direct_8x8_inference
    val (cl, cr, ct, cb) = crop
    if (cl + cr + ct + cb > 0) { w.u(1, 1); w.ue(cl).ue(cr).ue(ct).ue(cb) }
    else w.u(0, 1)
    w.u(0, 1) // vui absent
    w.u(1, 1) // rbsp stop bit
    Array(0x67.toByte) ++ w.toBytes
  }

  /** avcC box (ISO 14496-15 §5.3.3): configuration record wrapping one
    * SPS, zero PPS. */
  def avcCBox(profile: Int, level: Int, sps: Array[Byte]): Array[Byte] =
    box("avcC", Array(1.toByte, profile.toByte, 0.toByte, level.toByte,
      0xff.toByte, 0xe1.toByte) ++ be16(sps.length) ++ sps ++
      Array(0.toByte))

  /** The 70 fixed VisualSampleEntry bytes after data_reference_index
    * (ISO 14496-12 §12.1.3): declared width/height, resolutions,
    * frame_count, compressorname, depth — child boxes follow. */
  def visualEntryFields(width: Int, height: Int): Array[Byte] =
    be16(0) ++ be16(0) ++ Array.fill(12)(0.toByte) ++ // pre_defined/reserved
      be16(width) ++ be16(height) ++
      be32(0x00480000) ++ be32(0x00480000) ++ be32(0) ++ // resolutions
      be16(1) ++ Array.fill(32)(0.toByte) ++ // frame_count, compressorname
      be16(24) ++ be16(0xffff) // depth, pre_defined

  /** Self-contained single-track MP4: ftyp + mdat + moov with the full
    * sample-table chain (trak/mdia/mdhd/hdlr/minf/stbl/stsd+stsz+stsc+
    * stco) — the same box layout every MP4 muxer writes (ISO/IEC
    * 14496-12). Two chunks when more than two frames, so stsc run
    * decoding is exercised beyond the one-chunk degenerate case. */
  def mp4Bytes(frames: Seq[Array[Byte]], codec: String = "jpeg",
      timescale: Int = 600, duration: Int = 3000,
      entryExtra: Array[Byte] = Array.empty): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isom".getBytes("US-ASCII") ++ "iso2".getBytes("US-ASCII"))
    val mdatData = frames.flatten.toArray
    val mdat = box("mdat", mdatData)
    // chunk 1 = first 2 samples, chunk 2 = rest (1 chunk if <=2 frames)
    val split = math.min(2, frames.length)
    val chunk1Off = ftyp.length + 8
    val chunk2Off = chunk1Off + frames.take(split).map(_.length).sum
    val nChunks = if (frames.length > split) 2 else 1
    val stsd = full("stsd", be32(1) ++
      box(codec, Array.fill(6)(0.toByte) ++ Array(0.toByte, 1.toByte) ++
        entryExtra))
    val stsz = full("stsz", be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    val stsc = full("stsc",
      if (nChunks == 2)
        be32(2) ++ be32(1) ++ be32(split) ++ be32(1) ++
          be32(2) ++ be32(frames.length - split) ++ be32(1)
      else be32(1) ++ be32(1) ++ be32(frames.length) ++ be32(1))
    val stco = full("stco",
      if (nChunks == 2) be32(2) ++ be32(chunk1Off) ++ be32(chunk2Off)
      else be32(1) ++ be32(chunk1Off))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val mdhd = full("mdhd", be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ Array(0x55.toByte, 0xc4.toByte, 0.toByte, 0.toByte))
    val hdlr = full("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++
      Array.fill(13)(0.toByte))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  /** Emulation-prevention escaping (ITU-T H.264 §7.4.1.1): insert an
    * 0x03 byte after any 0x0000 pair followed by 0x00..0x03 so the RBSP
    * never fakes a start code inside the NAL payload. Applied to every
    * hand-written NAL after its header byte; the demux twin
    * ([[Multimodal.epbUnescape]]) strips it back. */
  def epbEscape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i)
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 0x03.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  /** Minimal conformant PPS NAL (ITU-T H.264 §7.3.2.2): CAVLC, one
    * slice group, no deblocking-control / redundant-count presence —
    * exactly the flags [[ipcmIdrNal]]'s slice header is written
    * against, and what [[Multimodal.avcIntraDcGrid]] parses back. */
  def ppsNal(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0).ue(0) // pic_parameter_set_id, seq_parameter_set_id
    w.u(0, 1) // entropy_coding_mode_flag = CAVLC
    w.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    w.ue(0) // num_slice_groups_minus1
    w.ue(0).ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    w.u(0, 1).u(0, 2) // weighted_pred_flag, weighted_bipred_idc
    w.ue(0).ue(0).ue(0) // qp/qs/chroma offsets (se(0) == ue(0) bits)
    w.u(0, 1) // deblocking_filter_control_present_flag
    w.u(0, 1) // constrained_intra_pred_flag
    w.u(0, 1) // redundant_pic_cnt_present_flag
    w.u(1, 1) // rbsp stop bit
    Array(0x68.toByte) ++ epbEscape(w.toBytes)
  }

  /** A REAL all-I_PCM IDR slice NAL (ITU-T H.264 §7.3.3 slice header +
    * §7.3.5 slice data, mb_type 25 of table 7-11): I_PCM macroblocks
    * carry their samples UNCOMPRESSED in the bitstream — the spec's
    * own parseable escape hatch, legal in every profile — so a
    * dependency-free reader can recover true pixel content from a
    * conformant H.264 stream with no entropy decoder. Each 16×16
    * macroblock is filled with the constant `luma(mbRow, mbCol)`
    * (chroma flat 128, 4:2:0). Written against [[spsNal]] poc-type-0
    * defaults (4-bit frame_num, 4-bit poc_lsb) and [[ppsNal]]'s flags. */
  def ipcmIdrNal(widthMbs: Int, heightMbs: Int,
      luma: (Int, Int) => Int): Array[Byte] = {
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices of picture)
    w.ue(0) // pic_parameter_set_id
    w.u(0, 4) // frame_num (log2_max_frame_num = 4)
    w.ue(0) // idr_pic_id
    w.u(0, 4) // pic_order_cnt_lsb (poc type 0, log2 = 4)
    w.u(0, 1).u(0, 1) // dec_ref_pic_marking: no_output, long_term
    w.ue(0) // slice_qp_delta (se(0))
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      w.ue(25) // mb_type I_PCM
      w.align() // pcm_alignment_zero_bit*
      val v = luma(mb / widthMbs, mb % widthMbs) & 0xff
      var i = 0
      while (i < 256) { w.u(v, 8); i += 1 } // pcm_sample_luma
      i = 0
      while (i < 128) { w.u(128, 8); i += 1 } // pcm_sample_chroma (4:2:0)
      mb += 1
    }
    w.u(1, 1) // rbsp stop bit
    Array(0x65.toByte) ++ epbEscape(w.toBytes)
  }

  /** A REAL entropy-coded IDR slice NAL: every macroblock is either
    * I_PCM (mb_type 25, as [[ipcmIdrNal]]) or CAVLC-coded
    * Intra_16x16_DC with a DC-ONLY luma residual (mb_type 3 of table
    * 7-11: prediction mode 2 = DC, CodedBlockPattern luma/chroma 0),
    * per `pcm(r, c)`. The Intra_16x16 macroblocks exercise the actual
    * H.264 entropy layer — coeff_token (table 9-5, nC < 2 column),
    * level prefix/suffix with the 14/15 escape ladder (§9.2.2.1),
    * total_zeros, Exp-Golomb mb headers — the coverage step past
    * I_PCM's entropy-free escape hatch (VERDICT r12 item 6).
    *
    * The encoder does what a real encoder does: reconstructs as it
    * codes. Each CAVLC macroblock's residual is the DC coefficient
    * `L = 4·(target − pred) − 2` (at qp 16 the dequant chain
    * dcY = 16·L, per-pixel residual (dcY+32)>>6 = (L+2)>>2 recovers
    * `target − pred` exactly), where pred is the §8.3.3.1 DC
    * prediction over the previously reconstructed (flat) neighbor
    * macroblocks — so the decoded macroblock mean equals
    * `luma(r, c)` bit-exactly, the synthesize→recover contract.
    * CAVLC macroblocks whose LEFT or TOP neighbor is I_PCM would need
    * the nC ≥ 2 coeff_token columns (I_PCM neighbors count 16 coeffs,
    * §9.2.1) — callers keep PCM rows below all CAVLC rows. */
  def intraDcIdrNal(widthMbs: Int, heightMbs: Int,
      luma: (Int, Int) => Int, pcm: (Int, Int) => Boolean): Array[Byte] = {
    // qp is FIXED at 16: there (and only there) the §8.5.10 DC dequant
    // chain is the identity dcY = 16·L, so L = 4·res − 2 reconstructs
    // any integer residual exactly and the decoded macroblock mean
    // equals the target bit-for-bit. Other qps decode fine (the reader
    // tracks slice/mb qp) but quantize, which would break the
    // synthesize→recover equality this fixture encoder exists for.
    val qp = 16
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices of picture)
    w.ue(0) // pic_parameter_set_id
    w.u(0, 4) // frame_num (log2_max_frame_num = 4)
    w.ue(0) // idr_pic_id
    w.u(0, 4) // pic_order_cnt_lsb (poc type 0, log2 = 4)
    w.u(0, 1).u(0, 1) // dec_ref_pic_marking: no_output, long_term
    w.se(qp - 26) // slice_qp_delta (pic_init_qp_minus26 = 0)
    val prevRow = new Array[Int](widthMbs) // reconstructed flat values
    val curRow = new Array[Int](widthMbs)
    var seenPcm = false
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      val r = mb / widthMbs; val c = mb % widthMbs
      val v = luma(r, c) & 0xff
      if (pcm(r, c)) {
        seenPcm = true
        w.ue(25) // mb_type I_PCM
        w.align()
        var i = 0
        while (i < 256) { w.u(v, 8); i += 1 }
        i = 0
        while (i < 128) { w.u(128, 8); i += 1 }
        curRow(c) = v
      } else {
        // a CAVLC macroblock at or after an I_PCM one could have a PCM
        // neighbor, whose 16-coefficient nC needs table columns this
        // DC-only encoder does not write — refuse rather than emit a
        // stream the paired decoder (or any decoder) would misread
        require(!seenPcm,
          "intraDcIdrNal: CAVLC macroblocks must precede all I_PCM ones")
        val topOk = r > 0; val leftOk = c > 0
        val pred =
          if (topOk && leftOk) (prevRow(c) + curRow(c - 1) + 1) >> 1
          else if (topOk) prevRow(c)
          else if (leftOk) curRow(c - 1)
          else 128
        val res = v - pred
        w.ue(3) // mb_type I_16x16_2_0_0 (DC pred, cbp 0)
        w.ue(0) // intra_chroma_pred_mode: DC
        w.se(0) // mb_qp_delta
        if (res == 0) w.u(1, 1) // coeff_token (0,0), nC<2: '1'
        else {
          w.u(5, 6) // coeff_token (TotalCoeff 1, T1s 0), nC<2: '000101'
          val level = 4 * res - 2 // even, never ±1
          // §9.2.2.1 inverted: levelCode, minus the first-coefficient
          // +2 the decoder will re-add (trailing_ones < 3)
          val lc = (if (level > 0) 2 * level - 2 else -2 * level - 1) - 2
          if (lc < 14) w.u(1, lc + 1) // lc zeros then the marker 1
          else if (lc < 30) { w.u(1, 15); w.u(lc - 14, 4) } // prefix 14
          else { w.u(1, 16); w.u(lc - 30, 12) } // prefix 15 escape
          w.u(1, 1) // total_zeros = 0 (coefficient at scan index 0)
        }
        curRow(c) = v
      }
      if (c == widthMbs - 1) { System.arraycopy(curRow, 0, prevRow, 0, widthMbs) }
      mb += 1
    }
    w.u(1, 1) // rbsp stop bit
    Array(0x65.toByte) ++ epbEscape(w.toBytes)
  }

  /** Deterministic avc1 CAVLC fixture for `id`: [[avc1PcmFixture]]'s
    * shape — 9×8 macroblocks, ±14 walk luma, decoy declared dims,
    * unparseable second sample — but the IDR slice is ENTROPY-CODED
    * ([[intraDcIdrNal]], zero I_PCM macroblocks): real encoder output
    * shape, prefix "avq" walk bits, twins at id ≡ 1 (mod 10). */
  def avc1CavlcFixture(id: Long): Array[Byte] = {
    val wMbs = 9; val hMbs = 8
    val sps = spsNal(66, 30, wMbs, hMbs)
    val lum = Multimodal.walkValue(Multimodal.walkBit("avq", id))
    val slice = intraDcIdrNal(wMbs, hMbs, (r, c) => lum(r, c),
      (_, _) => false)
    val pps = ppsNal()
    val au = be32(sps.length) ++ sps ++
      be32(pps.length) ++ pps ++
      be32(slice.length) ++ slice
    val decoy = Array.fill(12)(5.toByte)
    mp4Bytes(Seq(au, decoy), codec = "avc1", timescale = 600,
      duration = 1200,
      entryExtra = visualEntryFields(640, 360) ++ avcCBox(66, 30, sps))
  }

  /** Deterministic avc1 I_PCM fixture for `id`: a real MP4 whose first
    * sample is a conformant H.264 IDR access unit (length-prefixed
    * SPS + PPS + all-I_PCM slice) of a 9×8-macroblock frame whose
    * per-macroblock luma follows the SAME ±14 gradient walk as the
    * MJPEG fixture (prefix "avp", [[Multimodal.walkBit]] twins at
    * id ≡ 1 (mod 10)); sample 1 is an UNPARSEABLE stand-in — the
    * wrong-sample tripwire: a demux regression that reads it drops the
    * row and the oracle row-count goes loud. Declared entry dims are a
    * constant decoy so recovered content can only come from the real
    * NAL/slice/PCM parse. */
  def avc1PcmFixture(id: Long): Array[Byte] = {
    val wMbs = 9; val hMbs = 8
    val sps = spsNal(66, 30, wMbs, hMbs)
    val lum = Multimodal.walkValue(Multimodal.walkBit("avp", id))
    val slice = ipcmIdrNal(wMbs, hMbs, (r, c) => lum(r, c))
    val pps = ppsNal()
    val au = be32(sps.length) ++ sps ++
      be32(pps.length) ++ pps ++
      be32(slice.length) ++ slice
    val decoy = Array.fill(12)(5.toByte)
    mp4Bytes(Seq(au, decoy), codec = "avc1", timescale = 600,
      duration = 1200,
      entryExtra = visualEntryFields(640, 360) ++ avcCBox(66, 30, sps))
  }

  /** Deterministic avc1 fixture for `id`: profile/level/mb-grid/crop/
    * frame count all derive from the id by the SAME arithmetic the
    * q151 oracle states in SQL, the declared entry dims are a constant
    * decoy (640×360) so recovered dimensions can only come from the
    * SPS Exp-Golomb parse, and frame payloads are opaque NAL stand-ins
    * (pixel decode is not under test — the demux span walk is). */
  def avc1Fixture(id: Long): Array[Byte] = {
    val profile = Array(66, 77, 100)((id % 3).toInt)
    val level = Array(30, 31, 40, 41)((id % 4).toInt)
    val wMbs = 10 + (id % 30).toInt
    val hMus = 8 + (id % 20).toInt
    val crop = if (id % 5 == 0) (1, 1, 1, 0) else (0, 0, 0, 0)
    val nFrames = 1 + (id % 3).toInt
    val frames = (0 until nFrames).map(f =>
      Array.fill(10 + ((id + f) % 7).toInt)(5.toByte))
    val sps = spsNal(profile, level, wMbs, hMus, frameMbsOnly = 1, crop)
    mp4Bytes(frames, codec = "avc1", timescale = 600,
      duration = 600 * nFrames,
      entryExtra = visualEntryFields(640, 360) ++ avcCBox(profile, level, sps))
  }
}
