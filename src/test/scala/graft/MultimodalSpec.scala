package graft

import graft.operators.Multimodal
import Multimodal.{HeaderDecoder, MediaHeaders, MediaRecord}

/** Pins the REAL image-header parsers on hand-built payloads — byte
  * layouts straight from the public specs — plus the corrupt-payload
  * contract the oracle row can't see ((-1, -1), never a fabricated
  * dimension). */
class MultimodalSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG IHDR dims parse; corrupt signature or truncation does not") {
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 0806000000 00000000")
    assert(MediaHeaders.pngDims(png).contains((640, 480)))
    assert(MediaHeaders.pngDims(png.take(20)).isEmpty) // truncated before dims
    val bad = png.clone(); bad(0) = 0x42
    assert(MediaHeaders.pngDims(bad).isEmpty)
    assert(MediaHeaders.pngDims(hex("89504E470D0A1A0A 0000000D 49484453 00000280 000001E0")).isEmpty) // not IHDR
  }

  test("JPEG marker walk skips APP0/COM/RST and reads SOF0 and progressive SOF2 dims") {
    val app0 = "FFE000104A46494600010100000100010000"
    val sof0 = "FFC00011 08 01E0 0280 03 012200 021101 031101" // h=480 w=640
    assert(MediaHeaders.jpegDims(hex(s"FFD8 $app0 $sof0")).contains((640, 480)))
    // a COM segment and a standalone RST marker before a progressive SOF2
    val com = "FFFE0004ABCD"
    val sof2 = "FFC20011 08 0010 0020 03 012200 021101 031101" // h=16 w=32
    assert(MediaHeaders.jpegDims(hex(s"FFD8 FFD0 $com $sof2")).contains((32, 16)))
    // DHT (C4) must NOT be taken for a frame header
    val dht = "FFC40004ABCD"
    assert(MediaHeaders.jpegDims(hex(s"FFD8 $dht $sof0")).contains((640, 480)))
    assert(MediaHeaders.jpegDims(hex("FFD8 FFE000104A46494600010100000100010000")).isEmpty) // no SOF
    assert(MediaHeaders.jpegDims(hex("4242")).isEmpty) // not a JPEG
  }

  test("GIF LE dims parse for 87a and 89a; BMP abs-height; corruption does not parse") {
    // 640 LE16 = 8002, 480 LE16 = E001
    assert(MediaHeaders.gifDims(hex("474946383961 8002 E001 000000")).contains((640, 480)))
    assert(MediaHeaders.gifDims(hex("474946383761 8002 E001 000000")).contains((640, 480)))
    assert(MediaHeaders.gifDims(hex("474946383861 8002 E001 000000")).isEmpty) // "GIF88a"
    assert(MediaHeaders.gifDims(hex("47494638 3961")).isEmpty) // truncated
    val bmp = "424D 00000000 0000 0000 36000000 28000000 80020000 E0010000 0100 1800"
    assert(MediaHeaders.bmpDims(hex(bmp)).contains((640, 480)))
    // top-down BMP: height −480 (LE32 two's complement) reports magnitude
    val topDown = bmp.replace("E0010000", "20FEFFFF")
    assert(MediaHeaders.bmpDims(hex(topDown)).contains((640, 480)))
    assert(MediaHeaders.bmpDims(hex("424D 0000")).isEmpty) // truncated
    assert(MediaHeaders.bmpDims(hex(bmp.replaceFirst("424D", "4242"))).isEmpty)
  }

  test("corrupt image payload surfaces (-1, -1), never a fabricated dimension") {
    val r = HeaderDecoder.decode(MediaRecord(7L, Array[Byte](1, 2, 3), "image/png"))
    assert(r.width == -1 && r.height == -1 && r.byte_len == 3)
    // non-image types still route to the stub codec
    val s = HeaderDecoder.decode(MediaRecord(7L, Array.fill[Byte](100)(65), "text/plain"))
    assert(s.width == 100 % 640 && s.height == (100 * 7) % 480)
  }

  test("TIFF IFD walk: both byte orders, SHORT and LONG values, offset-entry skip") {
    // little-endian "II": width SHORT 640, height SHORT 480, an ASCII
    // Make entry whose value field is an OFFSET (must be skipped, not
    // followed), orientation SHORT 6
    val le = hex("49492A00 08000000 0400" +
      "0001 0300 01000000 80020000" +
      "0101 0300 01000000 E0010000" +
      "0F01 0200 06000000 3E000000" +
      "1201 0300 01000000 06000000" +
      "00000000")
    assert(MediaHeaders.tiffMeta(le).contains((640, 480, 6)))
    // big-endian "MM" with the width in the LONG (type-4) layout
    val be = hex("4D4D002A 00000008 0004" +
      "0100 0004 00000001 00000280" +
      "0101 0003 00000001 01E00000" +
      "010F 0002 00000006 0000003E" +
      "0112 0003 00000001 00060000" +
      "00000000")
    assert(MediaHeaders.tiffMeta(be).contains((640, 480, 6)))
    // orientation absent → EXIF default 1 (top-left)
    val noOrient = hex("49492A00 08000000 0200" +
      "0001 0300 01000000 80020000" +
      "0101 0300 01000000 E0010000" +
      "00000000")
    assert(MediaHeaders.tiffMeta(noOrient).contains((640, 480, 1)))
    // structural failures: wrong magic, unknown byte order, truncation,
    // entry table overrunning the buffer
    assert(MediaHeaders.tiffMeta(hex("49492B00 08000000")).isEmpty)
    assert(MediaHeaders.tiffMeta(hex("58592A00 08000000")).isEmpty)
    assert(MediaHeaders.tiffMeta(le.take(6)).isEmpty)
    assert(MediaHeaders.tiffMeta(le.take(30)).isEmpty)
    // adversarial IFD offsets near/past 2^31: Int arithmetic on the
    // u32 offset would wrap `ifd + 2` negative and slip past the bounds
    // guard into an ArrayIndexOutOfBounds — the walk must do the math
    // in Long and return None, never crash the executor task
    assert(MediaHeaders.tiffMeta(hex("49492A00 FEFFFF7F")).isEmpty) // 0x7FFFFFFE
    assert(MediaHeaders.tiffMeta(hex("49492A00 FFFFFFFF")).isEmpty) // 0xFFFFFFFF
    assert(MediaHeaders.tiffMeta(hex("4D4D002A 80000000")).isEmpty) // 0x80000000 BE
    // entry-count overflow: a valid small IFD offset whose claimed
    // 0xFFFF entries * 12 would overrun — caught by the Long guard
    assert(MediaHeaders.tiffMeta(hex("49492A00 08000000 FFFF")).isEmpty)
  }

  test("box resample: hand-computed 2x2 floor-means, truncation edges, empty sentinel") {
    import graft.operators.Multimodal.BoxResample
    // 32 chars of 'a' = a 16x2 grid -> one 8-wide output row, every
    // block (97+97+97+97)/4 = 97
    val flat = BoxResample(1L, "a" * 32)
    assert((flat.out_h, flat.px_n, flat.px_sum, flat.px_wsum) == (1L, 8L, 776L, 3492L))
    assert((flat.px_min, flat.px_max, flat.px_first, flat.px_last) == (97L, 97L, 97L, 97L))
    // "abcd" repeating: blocks alternate floor((97+98)*2/4)=97 and
    // floor((99+100)*2/4)=99 — the floor of 97.5/99.5, pinning that the
    // mean is the INTEGER floor-mean of real block values, not a stride
    // pick of any single source pixel (98/100 would differ)
    val striped = BoxResample(2L, "abcd" * 8)
    assert((striped.px_sum, striped.px_wsum) == (784L, 3532L))
    assert((striped.px_first, striped.px_last) == (97L, 99L))
    // truncation edge: 47 chars = 2 full rows + 15 spare -> same grid as
    // 32 chars; the spare tail must not leak into any block
    assert(BoxResample(3L, "a" * 32 + "z" * 15).px_sum == 776L)
    // payload shorter than one full block row -> empty grid, sentinels
    val empty = BoxResample(4L, "a" * 31)
    assert((empty.out_h, empty.px_n, empty.px_sum) == (0L, 0L, 0L))
    assert((empty.px_min, empty.px_max, empty.px_first, empty.px_last) ==
      (-1L, -1L, -1L, -1L))
  }

  test("WAV chunk walk: LIST skip, odd-size padding, and structural failures") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]) =
      id.getBytes ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def fmt(ch: Int, rate: Int, bits: Int) =
      chunk("fmt ", le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate * ch * bits / 8) ++
        le16(ch * bits / 8) ++ le16(bits))
    def wav(chunks: Array[Byte]) =
      "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
    // an ODD-size LIST chunk before fmt forces the even-padding skip
    val good = wav(chunk("LIST", Array[Byte](1, 2, 3)) ++ fmt(2, 16000, 16) ++
      ("data".getBytes ++ le32(32000)))
    assert(MediaHeaders.wavMeta(good).contains((2, 16000, 16, 500L))) // 32000B / 64000B/s
    // data before fmt → no format to report
    val dataFirst = wav("data".getBytes ++ le32(100) ++ fmt(1, 8000, 16))
    assert(MediaHeaders.wavMeta(dataFirst).isEmpty)
    // truncation and a non-WAVE RIFF both fail structurally
    assert(MediaHeaders.wavMeta(good.take(6)).isEmpty)
    assert(MediaHeaders.wavMeta("RIFF".getBytes ++ le32(4) ++ "AVI ".getBytes).isEmpty)
  }

  test("aHash is brightness-invariant and shape-sensitive — what md5 cannot see") {
    import graft.operators.Multimodal.AHash64
    val base = "aAbBcCdDeEfFgGhH" * 4 // 64 code points
    // uniform +1 brightness shift: every pixel and the mean move together
    val brighter = base.map(c => (c + 1).toChar)
    assert(AHash64(1L, base).phash == AHash64(2L, brighter).phash,
      "a uniform code-point shift must not change the above-mean shape")
    assert(AHash64(1L, base).phash.length == 64)
    // flipping one bright pixel dark changes the shape
    val flipped = base.updated(0, ' ')
    assert(AHash64(1L, base).phash != AHash64(3L, flipped).phash)
    // short payloads hash their prefix; empty payloads sentinel to ""
    assert(AHash64(4L, "ab").phash.length == 2)
    assert(AHash64(5L, "").phash == "")
  }
}
