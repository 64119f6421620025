package graft.ext

/** The ONE RIFF/AVI container writer for in-repo FIXTURES — the m7/m8
  * oracle fixtures ([[graft.queries]]) and the videodecode battery
  * ([[graft.ScaleStress]]) previously each hand-rolled the same
  * le32/chunk/list helpers and header layout, and a third copy lives in
  * ExtSpec for hostile-container cases (deliberately separate: its tests
  * malform exactly these fields). Not a production surface: the engine
  * only PARSES AVI ([[Multimodal.Avi]]); this exists so container fixes
  * land once for every well-formed fixture.
  *
  * Layout: RIFF(AVI ) → LIST(hdrl){ avih, LIST(strl){ strh vids, strf
  * BITMAPINFOHEADER } } → LIST(movi){ frame chunks }. 24-bit; MJPG
  * fourcc selects `00dc` frame tags and the 'MJPG' biCompression,
  * anything else writes BI_RGB (0) under `00db`.
  */
private[graft] object AviFixture {

  def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  def chunk(fc: String, d: Array[Byte]): Array[Byte] =
    cc(fc) ++ le32(d.length.toLong) ++ d ++
      (if (d.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  def list(lt: String, b: Array[Byte]): Array[Byte] = chunk("LIST", cc(lt) ++ b)

  /** A complete single-video-stream AVI holding `frames` (raw frame
    * payloads: padded bottom-up BGR rows for DIB, complete JPEGs for
    * MJPG). */
  def container(w: Int, h: Int, fourcc: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val mjpeg = fourcc == "MJPG"
    val avih = chunk("avih",
      le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
        le32(frames.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
        le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh",
      cc("vids") ++ cc(fourcc) ++ Array.fill(48)(0.toByte))
    val strf = chunk("strf",
      le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
        Array[Byte](1, 0, 24, 0) ++
        (if (mjpeg) cc("MJPG") else le32(0L)) ++
        le32((w * 3 * h).toLong) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val tag = if (mjpeg) "00dc" else "00db"
    val movi = list("movi", frames.flatMap(f => chunk(tag, f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }
}
