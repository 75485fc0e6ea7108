package graft.ops

/** The byte-level base alphabet of the learned-BPE tier — a fixed
  * bijection byte → printable char in the GPT-2 posture (Radford et
  * al. 2019's `bytes_to_unicode`, public): every UTF-8 BYTE of a
  * pre-token becomes exactly one mapped character, so the tokenizer
  * sees digits, punctuation, accents and every non-Latin script as
  * 256 base symbols with NO out-of-vocabulary text, while the symbol
  * machinery ([[Bpe]]'s space-delimited '|'-terminated sequences and
  * its DuckDB oracle twin) keeps operating on ordinary strings.
  *
  * Self-mapped bytes are the printable-ASCII range [33..126] MINUS the
  * two characters the sequence representation reserves — '|' (0x7C,
  * the symbol terminator) and '<' (0x3C, so no merged symbol can ever
  * spell the '</w>' end-of-word marker) — plus the Latin-1 printables
  * [161..172] and [174..255] (GPT-2's choice). The remaining 70 bytes
  * (controls, space, DEL, 0x7F..0xA0, 0xAD, and our two reserved
  * chars) map in ascending byte order to consecutive codepoints from
  * U+0100. Consequences the rest of the tier relies on:
  *
  *  - mapped chars are never ' ', '|', '<', or any control — the
  *    seq-replace machinery and the '(.)' per-char regexes stay valid;
  *  - 'a'..'z', 'A'..'Z', '0'..'9' and most ASCII punctuation map to
  *    THEMSELVES, so pure-ASCII fixtures read unchanged (and the
  *    pre-byte-level oracle fixtures keep their hashes);
  *  - the map is a bijection: [[unmap]] restores the exact original
  *    bytes, so token concatenation minus '</w>' rebuilds the word.
  *
  * Token ids ([[graft.functions.BpeEncode]] `emitIds`): '</w>' = 0,
  * base byte b = b + 1 (1..256), merged symbol = 256 + min rank
  * producing the string.
  */
object ByteAlphabet {

  /** Base-id space size (one id per byte; merged ids start above). */
  val BaseIds = 256

  private def selfMapped(b: Int): Boolean =
    (b >= 33 && b <= 126 && b != '|'.toInt && b != '<'.toInt) ||
      (b >= 161 && b <= 172) || (b >= 174 && b <= 255)

  /** byte value (0..255) → mapped char. */
  val charOf: Array[Char] = {
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (selfMapped(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** mapped char → byte value, -1 for chars outside the alphabet. */
  val byteOf: Array[Int] = {
    val max = charOf.max.toInt
    val out = Array.fill(max + 1)(-1)
    var b = 0
    while (b < 256) { out(charOf(b).toInt) = b; b += 1 }
    out
  }

  /** Byte value of a mapped char; -1 if the char is not in the alphabet. */
  def byteValue(c: Char): Int = if (c.toInt < byteOf.length) byteOf(c.toInt) else -1

  /** A string's UTF-8 bytes mapped through the alphabet (the form every
    * BPE surface consumes as `word`).
    */
  def map(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = charOf(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Inverse of [[map]] — bytes back from mapped chars (throws on a
    * char outside the alphabet).
    */
  def unmap(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = byteValue(s.charAt(i))
      require(b >= 0, s"char U+${s.charAt(i).toInt.toHexString} is not in the byte alphabet")
      bytes(i) = b.toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The map as a DuckDB inline relation `(hx, bv, mc)` — uppercase
    * two-digit hex of the byte, the byte value, and the mapped char —
    * so the oracle maps words byte-for-byte via
    * `substr(hex(encode(word)), 2i-1, 2)` joins. `chr()` keeps the SQL
    * free of quoting/encoding hazards.
    */
  def duckdbMapRelation: String =
    (0 until 256).map { b =>
      "('%02X', %d, chr(%d))".format(b, b, charOf(b).toInt)
    }.mkString("(VALUES ", ", ", ") AS t(hx, bv, mc)")
}
