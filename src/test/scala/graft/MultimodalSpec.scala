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

  test("corrupt image payload surfaces (-1, -1), never a fabricated dimension") {
    val r = HeaderDecoder.decode(MediaRecord(7L, Array[Byte](1, 2, 3), "image/png"))
    assert(r.width == -1 && r.height == -1 && r.byte_len == 3)
    // non-image types still route to the stub codec
    val s = HeaderDecoder.decode(MediaRecord(7L, Array.fill[Byte](100)(65), "text/plain"))
    assert(s.width == 100 % 640 && s.height == (100 * 7) % 480)
  }
}
