package graft.tools

/** One-shot generator for the full public Traditional→Simplified
  * one-character table: `runMain graft.tools.ZhTableGen [outPath]`.
  *
  * Data source: ICU4J's CLDR `Traditional-Simplified` transliterator
  * (icu4j ships with the Spark distribution at /opt/spark/jars — no
  * network, no extra dependency). CLDR's transform carries the public
  * Unihan/简化字总表-derived mapping, the same public table langconv's
  * `zh_wiki` dictionaries encode — so this is the reference-faithful
  * data source available offline (the reference converts with
  * `Converter('zh-hans')`, `zhwiki_leafs.py:144`, but does not vendor
  * the table).
  *
  * Emits one-to-one CHAR pairs only (one BMP/SIP char in, one char
  * out, input ≠ output) as `<trad>\t<simp>` lines, sorted by code
  * point, to `src/main/resources/graft/zh_hant2hans.tsv`. Multi-char
  * phrase context stays the job of TextNorm's phrase-override layer.
  * The output is committed; regeneration is only needed when CLDR
  * updates (the file header records the ICU version).
  */
object ZhTableGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/zh_hant2hans.tsv")
    val t = com.ibm.icu.text.Transliterator.getInstance("Traditional-Simplified")
    // CJK Unified Ideographs + Extension A + Compatibility Ideographs
    val ranges = Seq(0x3400 to 0x4DBF, 0x4E00 to 0x9FFF, 0xF900 to 0xFAD9)
    val pairs = for {
      r <- ranges
      cp <- r
      s = new String(Character.toChars(cp))
      conv = t.transliterate(s)
      // one code point out (keys are all BMP by range construction;
      // values may be supplementary-plane chars like 㠣→𫵷 — TextNorm
      // routes those through a small secondary Map[Char, String])
      if conv != s && conv.codePointCount(0, conv.length) == 1 &&
        // image must be a FIXPOINT so the char table is idempotent by
        // construction (drops CLDR's one 2-cycle variant pair 苧↔苎)
        t.transliterate(conv) == conv
    } yield (s, conv)
    val header =
      s"# Traditional->Simplified one-char pairs from ICU CLDR (icu4j ${com.ibm.icu.util.VersionInfo.ICU_VERSION})\n"
    val body = pairs.map { case (a, b) => s"$a\t$b" }.mkString("\n")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, header + body + "\n")
    println(s"[zhgen] wrote ${pairs.size} pairs to $out")
  }
}
