package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Forward-maximum-match (FMM) dictionary segmentation for CJK runs —
  * capability parity with the reference's IK smart-mode tokenizer
  * (rt-flink KeywordUtil.scala:18-42, which feeds "Apple手机"-shaped
  * product titles through IK and explodes the keywords).
  *
  * Tokenization contract (the kernel behind
  * [[TextFunctions.tokenize]]):
  *  1. split on ASCII whitespace runs (`\s+`, Java semantics — exactly
  *     the pre-round-9 whitespace tokenizer, so non-CJK text tokenizes
  *     IDENTICALLY to before and every existing oracle replays it);
  *  2. within a whitespace chunk, split maximal CJK runs
  *     ([一-龥], the same range as
  *     [[TextFunctions.cjkAsciiOnly]]) from non-CJK runs — "Apple手机"
  *     → "apple" + seg("手机");
  *  3. segment each CJK run by greedy longest-match against the
  *     dictionary (FMM — IK's "smart" mode is FMM plus ambiguity
  *     heuristics; FMM alone is the standard production approximation);
  *     characters with no dictionary word become single-char tokens
  *     (every CJK character is itself a word).
  *
  * The dictionary is a compile-time vocabulary (e-commerce/electronics
  * domain, matching the reference's fixtures); a production deployment
  * swaps in a full lexicon — the operator shape and the expression
  * plumbing are what this module pins. All methods are static-forwarded
  * for codegen (called directly from the generated Java).
  */
object CjkSegmenter {

  /** Compile-time lexicon: 2-5 char terms, longest-match wins. */
  private[functions] val words: Array[String] = Array(
    // devices & electronics
    "手机", "手机壳", "充电器", "充电宝", "数据线", "耳机", "蓝牙", "蓝牙耳机",
    "电脑", "平板", "平板电脑", "笔记本", "笔记本电脑", "键盘", "鼠标", "显示器",
    "相机", "摄像头", "智能", "智能手表", "手表", "音箱", "电视", "投影仪", "无线",
    "路由器", "硬盘", "内存", "芯片", "电池", "屏幕", "钢化膜", "保护套",
    // brands (the reference's fixture domain)
    "苹果", "华为", "小米", "三星", "联想", "索尼",
    // commerce
    "促销", "打折", "优惠", "优惠券", "秒杀", "包邮", "正品", "旗舰店",
    "套装", "礼盒", "新品", "现货", "预售", "拼团", "满减", "赠品",
    // apparel & daily goods
    "运动", "运动鞋", "鞋子", "衣服", "裤子", "外套", "连衣裙", "背包",
    "钱包", "口红", "面膜", "洗发水", "牙膏", "毛巾", "袜子", "帽子",
    // food & grocery
    "零食", "咖啡", "牛奶", "巧克力", "饼干", "矿泉水", "啤酒", "红酒",
    "大米", "食用油", "方便面", "酸奶", "坚果", "茶叶",
    // general
    "中国", "北京", "上海", "广州", "深圳", "快递", "物流", "客服",
    "评价", "退货", "退款", "发货", "收货", "购物", "购物车", "订单",
    "支付", "价格", "质量", "品牌", "型号", "颜色", "尺寸", "重量")

  private val dict: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.length * 2)
    words.foreach(w => { s.add(w); () })
    s
  }
  private val maxLen: Int = words.map(_.length).max

  private def isCjk(c: Char): Boolean = c >= '一' && c <= '龥'

  // hoisted: String.split("\\s+") would Pattern.compile per ROW on the
  // hottest path in the library (tokenize feeds simhash/Jaccard/keyword)
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Greedy longest-match over one CJK run. */
  private def segmentRun(run: String, out: java.util.ArrayList[UTF8String]): Unit = {
    var i = 0
    val n = run.length
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var m = 0
      while (l >= 2 && m == 0) {
        if (dict.contains(run.substring(i, i + l))) m = l
        l -= 1
      }
      val take = if (m > 0) m else 1
      out.add(UTF8String.fromString(run.substring(i, i + take)))
      i += take
    }
  }

  /** The full tokenize kernel (see object doc). Called from generated
    * code — one invocation per row.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[UTF8String](16)
    val chunks = Whitespace.split(str)
    var ci = 0
    while (ci < chunks.length) {
      val chunk = chunks(ci)
      ci += 1
      if (chunk.nonEmpty) {
        var hasCjk = false
        var k = 0
        while (k < chunk.length && !hasCjk) {
          if (isCjk(chunk.charAt(k))) hasCjk = true
          k += 1
        }
        if (!hasCjk) out.add(UTF8String.fromString(chunk))
        else {
          // alternate maximal CJK / non-CJK runs
          var i = 0
          while (i < chunk.length) {
            val start = i
            val cjk = isCjk(chunk.charAt(i))
            while (i < chunk.length && isCjk(chunk.charAt(i)) == cjk) i += 1
            val run = chunk.substring(start, i)
            if (cjk) segmentRun(run, out)
            else out.add(UTF8String.fromString(run))
          }
        }
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}
