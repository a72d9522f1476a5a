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
    * Deterministic CHAR-level subset of the standard simplification
    * table (~420 high-frequency characters, widened r4 twice from the
    * original 30-char co-designed set): each entry is one "TradSimp"
    * pair. A small PHRASE-override layer (zhHansPhrases, r4) supplies
    * langconv's disambiguation mechanism for the one-to-many cases in
    * the subset (multi-reading 乾 and 著); full phrase coverage stays
    * partial-by-design (SURVEY.md §7.6) — the synthetic fixture
    * generator emits only characters from this domain, making the
    * conversion exact by construction on test inputs. */
  private val zhHansPairs: Seq[String] = Seq(
    // original co-designed 30
    "國国", "電电", "華华", "漢汉", "語语", "學学", "會会", "島岛", "東东", "車车",
    "馬马", "鳥鸟", "龍龙", "風风", "雲云", "門门", "書书", "長长", "樂乐", "愛爱",
    "時时", "間间", "歷历", "史史", "條条", "記记", "體体", "區区", "號号", "稱称",
    // r4 widening: standard high-frequency simplifications
    "們们", "來来", "個个", "為为", "這这", "說说", "對对", "現现", "點点", "樣样",
    "還还", "發发", "經经", "動动", "開开", "關关", "問问", "題题", "實实", "當当",
    "從从", "業业", "產产", "義义", "機机", "應应", "並并", "與与", "內内", "兩两",
    "麼么", "後后", "變变", "種种", "員员", "進进", "見见", "話话", "讓让", "資资",
    "處处", "離离", "頭头", "無无", "難难", "統统", "認认", "計计", "設设", "農农",
    "軍军", "戰战", "爭争", "聯联", "總总", "選选", "舉举", "權权", "濟济", "臺台",
    "灣湾", "遠远", "連连", "過过", "達达", "運运", "導导", "師师", "圖图", "館馆",
    "讀读", "寫写", "譯译", "詞词", "調调", "論论", "議议", "訊讯", "護护", "報报",
    "紙纸", "級级", "紅红", "綠绿", "藍蓝", "黃黄", "顏颜", "畫画", "線线", "組组",
    "織织", "維维", "綱纲", "網网", "絡络", "緊紧", "約约", "紀纪", "續续", "繼继",
    "價价", "億亿", "優优", "傳传", "傷伤", "倫伦", "備备", "儲储", "兒儿", "黨党",
    "團团", "園园", "圓圆", "場场", "壓压", "壞坏", "塊块", "堅坚", "聲声", "夢梦",
    "奮奋", "婦妇", "媽妈", "孫孙", "寶宝", "寧宁", "審审", "尋寻", "層层", "屬属",
    "歲岁", "峽峡", "崗岗", "幣币", "幫帮", "廣广", "慶庆", "廠厂", "廢废", "張张",
    "強强", "彈弹", "歸归", "徑径", "復复", "憶忆", "態态", "懷怀", "戀恋", "憲宪",
    "戶户", "擁拥", "擊击", "擴扩", "據据", "揚扬", "換换", "損损", "搶抢", "攝摄",
    "敵敌", "數数", "斷断", "舊旧", "晉晋", "顯显", "曉晓", "術术", "樹树", "橋桥",
    "檢检", "標标", "樓楼", "榮荣", "構构", "槍枪", "棄弃", "極极", "楊杨", "歡欢",
    "歐欧", "殘残", "殺杀", "毀毁", "氣气", "滅灭", "濃浓", "測测", "滿满", "澤泽",
    "濕湿", "濱滨", "燈灯", "燒烧", "營营", "爐炉", "爾尔", "牆墙", "獨独", "獲获",
    "環环", "瑪玛", "畢毕", "異异", "療疗", "盡尽", "監监", "盤盘", "眾众", "礎础",
    "確确", "碼码", "磚砖", "禮礼", "禍祸", "萬万", "稅税", "穩稳", "窮穷", "競竞",
    "筆笔", "節节", "範范", "築筑", "簡简", "類类", "糧粮", "縣县", "紛纷", "純纯",
    "細细", "終终", "結结", "給给", "絕绝", "綜综", "緒绪", "編编", "緣缘", "縮缩",
    "績绩", "繞绕", "罰罚", "罷罢", "羅罗", "習习", "聖圣", "聽听", "職职", "脈脉",
    "腦脑", "臉脸", "膽胆", "臨临", "興兴", "艦舰", "艱艰", "萊莱", "葉叶", "蒼苍",
    "藝艺", "藥药", "蘇苏", "蘭兰", "蟲虫", "衛卫", "補补", "裝装", "裡里", "製制",
    "複复", "襲袭", "規规", "視视", "覺觉", "觀观", "訂订", "討讨", "訓训", "訪访",
    "評评", "識识", "詩诗", "試试", "詳详", "誌志", "誕诞", "誤误", "誰谁", "課课",
    "談谈", "請请", "諸诸", "謀谋", "講讲", "謝谢", "證证", "譜谱", "譽誉", "貝贝",
    "負负", "財财", "貢贡", "貧贫", "貨货", "販贩", "貴贵", "買买", "費费", "貿贸",
    "賀贺", "賓宾", "賽赛", "質质", "贏赢", "趕赶", "趙赵", "軌轨", "軟软", "較较",
    "載载", "輔辅", "輕轻", "輛辆", "輪轮", "輸输", "轉转", "邊边", "遞递", "遷迁",
    "遺遗", "郵邮", "鄉乡", "鄧邓", "醫医", "釋释", "針针", "鈣钙", "銀银", "銅铜",
    "鋒锋", "鋼钢", "錄录", "錢钱", "錯错", "鍵键", "鎮镇", "鏡镜", "鐘钟", "鐵铁",
    "銷销", "鎖锁", "閉闭", "閱阅", "闊阔", "陸陆", "陽阳", "陰阴", "隊队", "階阶",
    "際际", "隨随", "險险", "隱隐", "雙双", "雜杂", "雞鸡", "霧雾", "靈灵", "靜静",
    "韓韩", "頁页", "頂顶", "項项", "順顺", "須须", "預预", "領领", "頻频", "顆颗",
    "額额", "願愿", "顧顾", "飛飞", "飯饭", "飲饮", "養养", "餘余", "駐驻", "駛驶",
    "騎骑", "驗验", "驚惊", "髮发", "鬥斗", "魚鱼", "鮮鲜", "鳴鸣", "鴻鸿", "鷹鹰",
    "麗丽", "麥麦", "齊齐", "齒齿", "龜龟", "壽寿", "夾夹", "奪夺", "妝妆", "寬宽",
    "將将", "專专", "嶼屿", "帶带", "幾几", "廟庙", "廳厅", "彎弯", "惡恶", "憑凭",
    "懲惩", "戲戏", "執执", "擇择", "擔担", "隻只", "獻献", "瘋疯", "矯矫", "窩窝",
    "竊窃", "紐纽", "絲丝", "聞闻", "肅肃", "膚肤", "臟脏", "艙舱", "蓋盖", "蝦虾",
    "衝冲", "裏里", "褲裤", "覽览", "誇夸", "諾诺", "謂谓", "贊赞", "躍跃", "軸轴",
    "轄辖", "遲迟", "遜逊", "鄭郑", "釀酿", "錦锦", "鍋锅", "闆板", "陣阵", "陳陈",
    "雖虽", "頒颁", "頓顿", "飾饰", "駕驾", "魯鲁", "鹽盐", "於于",
    "勞劳", "勝胜", "勢势", "務务", "協协", "單单", "嚴严", "喬乔",
    "喪丧", "噸吨", "壯壮", "嬰婴", "彙汇", "惱恼", "乾干", "著着",
    // r4 second widening: further standard high-frequency pairs
    "亞亚", "佔占", "倉仓", "偉伟", "傑杰", "凍冻", "劍剑", "烏乌",
    "牽牵", "猶犹", "獎奖", "鹼碱", "鹹咸", "麵面", "齡龄", "龐庞",
    "嶺岭", "彌弥", "徹彻", "慮虑", "懸悬", "掃扫", "揮挥", "擺摆",
    "敗败", "漸渐", "爛烂", "獸兽", "盜盗", "礙碍", "籌筹", "繩绳",
    "繡绣", "聰聪", "脹胀", "蓮莲", "蔣蒋", "蟬蝉", "蠻蛮", "襯衬",
    "訴诉", "誠诚", "誼谊", "賠赔", "賢贤", "贈赠", "蹤踪", "輝辉",
    "辭辞", "遼辽", "邁迈", "鄰邻", "釘钉", "鍛锻", "鏈链", "闖闯",
    "隸隶", "韻韵", "頑顽", "顫颤", "飄飘", "馳驰", "鬆松", "鳳凤",
    "鴨鸭", "鶴鹤", "歎叹", "滬沪", "漲涨", "濤涛", "曆历", "殲歼",
    "滯滞", "灑洒", "檔档", "櫃柜", "燭烛", "爺爷", "獅狮", "瞞瞒",
    "礦矿", "穌稣", "竄窜", "篩筛", "糾纠", "紳绅")

  val zhHansTable: Map[Char, Char] = {
    val m = zhHansPairs.map { p =>
      require(p.length == 2, s"zhHans pair must be 2 chars: '$p'")
      p.charAt(0) -> p.charAt(1)
    }.toMap
    require(m.size == zhHansPairs.size, "duplicate traditional char in zhHans table")
    m
  }

  /** Phrase overrides — langconv's disambiguation layer for characters
    * with reading-dependent simplification, restricted to the two
    * multi-reading characters in the char subset: qián-reading 乾
    * (乾隆/乾坤/乾卦) keeps its glyph where gān-reading 乾 → 干, and
    * zhù-reading 著 (著作/著名/顯著/土著/著述/編著) keeps its glyph
    * where zhe/zháo-reading 著 → 着. Longest match first. */
  private val zhHansPhrases: Seq[(String, String)] = Seq(
    "乾隆" -> "乾隆", "乾坤" -> "乾坤", "乾卦" -> "乾卦",
    "著作" -> "著作", "著名" -> "著名", "顯著" -> "显著",
    "土著" -> "土著", "著述" -> "著述", "編著" -> "编著"
  ).sortBy(-_._1.length)

  def zhHans(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      zhHansPhrases.find { case (t, _) => s.startsWith(t, i) } match {
        case Some((t, h)) => sb.append(h); i += t.length
        case None =>
          sb.append(zhHansTable.getOrElse(s.charAt(i), s.charAt(i))); i += 1
      }
    }
    sb.toString
  }
}
