"""Build the bundled char->TONE3 pinyin data asset (text/pinyin_data.json).

The reference's text frontend is ``pypinyin.lazy_pinyin(text, Style.TONE3,
neutral_tone_with_five=True)`` (reference api.py:21, dataset_24k.py:117).
pypinyin cannot be installed in this environment, so the table is built from
two in-repo sources:

1. CURATED: a hand-written primary-reading table for frequent simplified
   Chinese characters (pypinyin conventions: 'v' for u-umlaut, neutral tone
   spelled '5'), plus a phrase table that disambiguates common polyphone
   words the way pypinyin's phrase dictionary does.

2. PROPAGATED: the system's Unicode CLDR pinyin *collation* data
   (/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm) lists ~21k CJK
   chars in (syllable, tone) order without naming the readings.  Any char
   sandwiched between two curated anchors that share one reading must carry
   that same reading — this soundly extends coverage to thousands of rarer
   characters.  A curated anchor that disagrees with two equal-reading
   neighbours is a polyphone listed here under a secondary reading; it is
   skipped as a propagation anchor (its curated primary stays in the table).

Run:  python scripts/build_pinyin_table.py   (writes the asset + stats)
"""
import json
import os
import re

PERL_DATA = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "detail_tts_tpu", "text", "pinyin_data.json")

CURATED = {}


def _add(s):
    for pair in s.split():
        ch, py = pair.split(":")
        assert len(ch) == 1, pair
        assert re.fullmatch(r"[a-z]+[1-5]", py), pair
        if ch in CURATED:
            assert CURATED[ch] == py, (ch, py, CURATED[ch])
        CURATED[ch] = py


# ---------------------------------------------------------------------------
# Frequent characters (roughly frequency-ordered bands).  Readings are the
# pypinyin single-character primaries, not necessarily the most frequent
# in-context reading — the PHRASES table handles context.
# ---------------------------------------------------------------------------

_add("""
的:de5 一:yi1 是:shi4 了:le5 我:wo3 不:bu4 人:ren2 在:zai4 他:ta1 有:you3
这:zhe4 个:ge4 上:shang4 们:men5 来:lai2 到:dao4 时:shi2 大:da4 地:di4 为:wei2
子:zi3 中:zhong1 你:ni3 说:shuo1 生:sheng1 国:guo2 年:nian2 着:zhe5 就:jiu4
那:na4 和:he2 要:yao4 她:ta1 出:chu1 也:ye3 得:de2 里:li3 后:hou4 自:zi4
以:yi3 会:hui4 家:jia1 可:ke3 下:xia4 而:er2 过:guo4 天:tian1 去:qu4 能:neng2
对:dui4 小:xiao3 多:duo1 然:ran2 于:yu2 心:xin1 学:xue2 么:me5 之:zhi1 都:dou1
好:hao3 看:kan4 起:qi3 发:fa1 当:dang1 没:mei2 成:cheng2 只:zhi1 如:ru2 事:shi4
把:ba3 还:hai2 用:yong4 第:di4 样:yang4 道:dao4 想:xiang3 作:zuo4 种:zhong3
开:kai1 美:mei3 总:zong3 从:cong2 无:wu2 情:qing2 己:ji3 面:mian4 最:zui4
女:nv3 但:dan4 现:xian4 前:qian2 些:xie1 所:suo3 同:tong2 日:ri4 手:shou3
又:you4 行:xing2 意:yi4 动:dong4 方:fang1 期:qi1 它:ta1 头:tou2 经:jing1
长:chang2 儿:er2 回:hui2 位:wei4 分:fen1 爱:ai4 老:lao3 因:yin1 很:hen3
给:gei3 名:ming2 法:fa3 间:jian1 斯:si1 知:zhi1 世:shi4 什:shen2 两:liang3
次:ci4 使:shi3 身:shen1 者:zhe3 被:bei4 高:gao1 已:yi3 亲:qin1 其:qi2
进:jin4 此:ci3 话:hua4 常:chang2 与:yu3 活:huo2 正:zheng4 感:gan3
""")

_add("""
见:jian4 明:ming2 问:wen4 力:li4 理:li3 尔:er3 点:dian3 文:wen2 几:ji3
定:ding4 本:ben3 公:gong1 特:te4 做:zuo4 外:wai4 孩:hai2 相:xiang1 西:xi1
果:guo3 走:zou3 将:jiang1 月:yue4 十:shi2 实:shi2 向:xiang4 声:sheng1
车:che1 全:quan2 信:xin4 重:zhong4 三:san1 机:ji1 工:gong1 物:wu4 气:qi4
每:mei3 并:bing4 别:bie2 真:zhen1 打:da3 太:tai4 新:xin1 比:bi3 才:cai2
便:bian4 夫:fu1 再:zai4 书:shu1 部:bu4 水:shui3 像:xiang4 眼:yan3 等:deng3
体:ti3 却:que4 加:jia1 电:dian4 主:zhu3 界:jie4 门:men2 利:li4 海:hai3
受:shou4 听:ting1 表:biao3 德:de2 少:shao3 克:ke4 代:dai4 员:yuan2 许:xu3
先:xian1 口:kou3 由:you2 死:si3 安:an1 写:xie3 性:xing4 马:ma3
光:guang1 白:bai2 或:huo4 住:zhu4 难:nan2 望:wang4 教:jiao4 命:ming4
花:hua1 结:jie2 乐:le4 色:se4 更:geng4 拉:la1 东:dong1 神:shen2 记:ji4
处:chu4 让:rang4 母:mu3 父:fu4 应:ying1 直:zhi2 字:zi4 场:chang3 平:ping2
报:bao4 友:you3 关:guan1 放:fang4 至:zhi4 张:zhang1 认:ren4 接:jie1
告:gao4 入:ru4 笑:xiao4 内:nei4 英:ying1 军:jun1 候:hou4 民:min2 岁:sui4
往:wang3 何:he2 度:du4 山:shan1 觉:jue2 路:lu4 带:dai4 万:wan4 男:nan2
边:bian1 风:feng1 解:jie3 叫:jiao4 任:ren4 金:jin1 快:kuai4 原:yuan2
吃:chi1 妈:ma1 变:bian4 通:tong1 师:shi1 立:li4 象:xiang4 数:shu4 四:si4
失:shi1 满:man3 战:zhan4 远:yuan3 格:ge2 士:shi4 音:yin1 轻:qing1 目:mu4
条:tiao2 呢:ne5 病:bing4 始:shi3 达:da2 深:shen1 完:wan2 今:jin1 提:ti2
求:qiu2 清:qing1 王:wang2 化:hua4 空:kong1 业:ye4 思:si1 切:qie1 怎:zen3
非:fei1 找:zhao3 片:pian4 罗:luo2 钱:qian2 吗:ma5 语:yu3 元:yuan2
喜:xi3 曾:ceng2 离:li2 飞:fei1 科:ke1 言:yan2 干:gan4 流:liu2 欢:huan1
约:yue1 各:ge4 即:ji2 指:zhi3 合:he2 反:fan3 题:ti2 必:bi4 该:gai1
论:lun4 交:jiao1 终:zhong1 林:lin2 请:qing3 医:yi1 晚:wan3 制:zhi4 球:qiu2
决:jue2 传:chuan2 画:hua4 保:bao3 读:du2 运:yun4 及:ji2 则:ze2
房:fang2 早:zao3 院:yuan4 量:liang4 苦:ku3 火:huo3 布:bu4 品:pin3 近:jin4
坐:zuo4 产:chan3 答:da2 星:xing1 精:jing1 视:shi4 五:wu3 连:lian2 司:si1
""")

_add("""
巴:ba1 奇:qi2 管:guan3 类:lei4 未:wei4 朋:peng2 且:qie3 婚:hun1 台:tai2
夜:ye4 青:qing1 北:bei3 队:dui4 久:jiu3 乎:hu1 越:yue4 观:guan1 落:luo4
尽:jin3 形:xing2 影:ying3 红:hong2 爸:ba4 百:bai3 令:ling4 周:zhou1 吧:ba5
识:shi2 步:bu4 希:xi1 亚:ya4 术:shu4 留:liu2 市:shi4 半:ban4 热:re4
送:song4 兴:xing4 造:zao4 谈:tan2 容:rong2 极:ji2 随:sui2 演:yan3 收:shou1
根:gen1 讲:jiang3 整:zheng3 式:shi4 取:qu3 照:zhao4 办:ban4
强:qiang2 石:shi2 古:gu3 华:hua2 拿:na2 计:ji4 您:nin2 装:zhuang1
似:si4 足:zu2 双:shuang1 妻:qi1 尼:ni2 转:zhuan3 诉:su4 米:mi3 称:cheng1
丽:li4 客:ke4 南:nan2 领:ling3 节:jie2 衣:yi1 站:zhan4 黑:hei1 刻:ke4
统:tong3 断:duan4 福:fu2 城:cheng2 故:gu4 历:li4 惊:jing1 脸:lian3 选:xuan3
包:bao1 紧:jin3 争:zheng1 另:ling4 建:jian4 维:wei2 绝:jue2 树:shu4 系:xi4
伤:shang1 示:shi4 愿:yuan4 持:chi2 千:qian1 史:shi3 谁:shei2 准:zhun3
联:lian2 妇:fu4 纪:ji4 基:ji1 买:mai3 志:zhi4 静:jing4 阿:a1 诗:shi1
独:du2 复:fu4 痛:tong4 消:xiao1 社:she4 算:suan4 义:yi4 竟:jing4 确:que4
酒:jiu3 需:xu1 单:dan1 治:zhi4 卡:ka3 幸:xing4 兰:lan2 念:nian4 举:ju3
仅:jin3 钟:zhong1 怕:pa4 共:gong4 毛:mao2 句:ju4 息:xi1 功:gong1 官:guan1
待:dai4 究:jiu1 跟:gen1 穿:chuan1 室:shi4 易:yi4 游:you2 程:cheng2 号:hao4
居:ju1 考:kao3 突:tu1 皮:pi2 哪:na3 费:fei4 倒:dao3 价:jia4 图:tu2
具:ju4 况:kuang4 毫:hao2 营:ying2 射:she4 礼:li3 细:xi4 专:zhuan1 状:zhuang4
育:yu4 姐:jie3 存:cun2 升:sheng1 显:xian3 支:zhi1 甚:shen4
险:xian3 野:ye3 严:yan2 证:zheng4 级:ji2 班:ban1 互:hu4
香:xiang1 份:fen4 妹:mei4 页:ye4 掉:diao4 绍:shao4 帮:bang1 线:xian4
刚:gang1 戏:xi4 团:tuan2 调:diao4 停:ting2 皇:huang2 土:tu3 память:x1
""".replace("память:x1", "永:yong3"))

_add("""
击:ji1 排:pai2 推:tui1 速:su4 板:ban3 置:zhi4 району:x1
""".replace("району:x1", "район:x1").replace("район:x1", "察:cha2"))

_add("""
素:su4 研:yan2 虽:sui1 归:gui1 района:x1
""".replace("района:x1", "钢:gang1"))

_add("""
顾:gu4 弄:nong4 李:li3 雪:xue3 仍:reng2 怪:guai4 梦:meng4 积:ji1
压:ya1 织:zhi1 段:duan4 坚:jian1 益:yi4 招:zhao1 破:po4 艺:yi4 责:ze2
丝:si1 木:mu4 遇:yu4 谢:xie4 初:chu1 低:di1 练:lian4 район:x2
""".replace("район:x2", "玩:wan2"))

_add("""
左:zuo3 右:you4 份:fen4 蓝:lan2 绿:lv4 黄:huang2 紫:zi3 灰:hui1 粉:fen3
棕:zong1 橙:cheng2 零:ling2 二:er4 六:liu4 七:qi1 八:ba1 九:jiu3 亿:yi4
兆:zhao4 双:shuang1 倍:bei4 首:shou3 末:mo4 序:xu4 排:pai2 列:lie4
顺:shun4 逆:ni4 奇:qi2 偶:ou3 加:jia1 减:jian3 乘:cheng2 除:chu2
等:deng3 于:yu2 率:lv4 比:bi3 例:li4 均:jun1 差:cha4 和:he2 积:ji1
商:shang1 余:yu2 数:shu4 计:ji4 测:ce4 估:gu1 核:he2 验:yan4 查:cha2
审:shen3 批:pi1 注:zhu4 标:biao1 符:fu2 码:ma3 序:xu4 号:hao4
""")

_add("""
吴:wu2 郑:zheng4 冯:feng2 陈:chen2 楚:chu3 魏:wei4 蒋:jiang3 沈:shen3
韩:han2 杨:yang2 朱:zhu1 秦:qin2 尤:you2 许:xu3 何:he2 吕:lv3 施:shi1
孔:kong3 曹:cao2 袁:yuan2 邓:deng4 萧:xiao1 潘:pan1 葛:ge3 奚:xi1
范:fan4 彭:peng2 鲁:lu3 韦:wei2 昌:chang1 苗:miao2 凤:feng4 董:dong3
梁:liang2 杜:du4 阮:ruan3 蓝:lan2 闵:min3 席:xi2 季:ji4 麻:ma2 贾:jia3
路:lu4 娄:lou2 危:wei1 童:tong2 颜:yan2 郭:guo1 梅:mei2 盛:sheng4
刁:diao1 钟:zhong1 徐:xu2 邱:qiu1 骆:luo4 高:gao1 夏:xia4 蔡:cai4
田:tian2 樊:fan2 胡:hu2 凌:ling2 霍:huo4 虞:yu2 万:wan4 柯:ke1
管:guan3 卢:lu2 莫:mo4 房:fang2 缪:miao4 干:gan4 解:jie3 应:ying1
宗:zong1 丁:ding1 宣:xuan1 贲:ben1 邳:pi1 郁:yu4 单:dan1 杭:hang2
洪:hong2 包:bao1 诸:zhu1 左:zuo3 崔:cui1 吉:ji2 钮:niu3 龚:gong1
程:cheng2 嵇:ji1 邢:xing2 裴:pei2 陆:lu4 荣:rong2 翁:weng1 荀:xun2
羊:yang2 於:yu2 惠:hui4 甄:zhen1 曲:qu3 封:feng1 芮:rui4 羿:yi4
储:chu3 靳:jin4 汲:ji2 邴:bing3 糜:mi2 松:song1 井:jing3 段:duan4
富:fu4 巫:wu1 乌:wu1 焦:jiao1 巴:ba1 弓:gong1 牧:mu4 隗:kui2 山:shan1
谷:gu3 车:che1 侯:hou2 宓:mi4 蓬:peng2 全:quan2 郗:xi1 班:ban1
仰:yang3 秋:qiu1 仲:zhong4 伊:yi1 宫:gong1 宁:ning2 仇:chou2 栾:luan2
暴:bao4 甘:gan1 钭:tou3 厉:li4 戎:rong2 祖:zu3 武:wu3 符:fu2 刘:liu2
景:jing3 詹:zhan1 束:shu4 龙:long2 叶:ye4 幸:xing4 司:si1 韶:shao2
黎:li2 蓟:ji4 薄:bo2 印:yin4 宿:su4 怀:huai2 蒲:pu2 邰:tai2 从:cong2
鄂:e4 索:suo3 咸:xian2 籍:ji2 赖:lai4 卓:zhuo2 蔺:lin4 屠:tu2
蒙:meng2 池:chi2 乔:qiao2 阴:yin1 郁:yu4 胥:xu1 能:neng2 苍:cang1
""")

_add("""
赵:zhao4 孙:sun1 周:zhou1 王:wang2 钱:qian2 褚:chu3 卫:wei4 蒋:jiang3
沈:shen3 韩:han2 杨:yang2 朱:zhu1 尤:you2 北:bei3 京:jing1 津:jin1
沪:hu4 渝:yu2 冀:ji4 晋:jin4 蒙:meng2 辽:liao2 宁:ning2 吉:ji2
黑:hei1 苏:su1 浙:zhe4 皖:wan3 闽:min3 赣:gan4 鲁:lu3 豫:yu4 鄂:e4
湘:xiang1 粤:yue4 桂:gui4 琼:qiong2 川:chuan1 蜀:shu3 贵:gui4 黔:qian2
滇:dian1 陕:shan3 甘:gan1 陇:long3 青:qing1 宁:ning2 新:xin1
疆:jiang1 港:gang3 澳:ao4 台:tai2 湾:wan1 省:sheng3 市:shi4 县:xian4
区:qu1 镇:zhen4 乡:xiang1 村:cun1 街:jie1 巷:xiang4 道:dao4 路:lu4
桥:qiao2 站:zhan4 广:guang3 州:zhou1 深:shen1 圳:zhen4 杭:hang2
宁:ning2 武:wu3 汉:han4 重:zhong4 庆:qing4 成:cheng2 昆:kun1 郑:zheng4
济:ji3 沈:shen3 阳:yang2 西:xi1 兰:lan2 银:yin2 拉:la1 萨:sa4 乌:wu1
鲁:lu3 木:mu4 齐:qi2 呼:hu1 浩:hao4 特:te4 泉:quan2 福:fu2
""")

_add("""
政:zheng4 府:fu3 党:dang3 委:wei3 局:ju2 厅:ting1 署:shu3 处:chu4
科:ke1 股:gu3 组:zu3 会:hui4 议:yi4 案:an4 法:fa3 律:lv4 规:gui1
章:zhang1 条:tiao2 款:kuan3 令:ling4 策:ce4 纲:gang1 领:ling3 宪:xian4
判:pan4 审:shen3 诉:su4 讼:song4 罪:zui4 罚:fa2 刑:xing2 狱:yu4
警:jing3 捕:bu3 逮:dai4 押:ya1 审:shen3 讯:xun4 供:gong1 证:zheng4
据:ju4 疑:yi2 嫌:xian2 犯:fan4 贪:tan1 污:wu1 贿:hui4 赂:lu4 腐:fu3
败:bai4 廉:lian2 洁:jie2 公:gong1 私:si1 权:quan2 利:li4 义:yi4
务:wu4 责:ze2 任:ren4 担:dan1 负:fu4 偿:chang2 赔:pei2 债:zhai4
税:shui4 费:fei4 捐:juan1 献:xian4 赠:zeng4 予:yu3 夺:duo2 抢:qiang3
盗:dao4 窃:qie4 骗:pian4 诈:zha4 假:jia3 伪:wei3 冒:mao4 真:zhen1
""")

_add("""
厂:chang3 矿:kuang4 企:qi3 贸:mao4 商:shang1 购:gou4 销:xiao1 售:shou4
租:zu1 赁:lin4 借:jie4 贷:dai4 款:kuan3 账:zhang4 户:hu4 存:cun2
储:chu3 蓄:xu4 资:zi1 金:jin1 币:bi4 钞:chao1 票:piao4 汇:hui4
兑:dui4 换:huan4 付:fu4 收:shou1 支:zhi1 出:chu1 入:ru4 盈:ying2
亏:kui1 赚:zhuan4 赔:pei2 损:sun3 耗:hao4 省:sheng3 节:jie2 俭:jian3
奢:she1 侈:chi3 浪:lang4 费:fei4 贵:gui4 贱:jian4 廉:lian2 涨:zhang3
跌:die1 降:jiang4 升:sheng1 值:zhi2 价:jia4 税:shui4 利:li4 息:xi1
股:gu3 市:shi4 券:quan4 证:zheng4 保:bao3 险:xian3 基:ji1 投:tou2
""")

_add("""
脑:nao3 脸:lian3 眉:mei2 睫:jie2 瞳:tong2 鼻:bi2 唇:chun2 齿:chi3
舌:she2 颊:jia2 额:e2 颌:he2 腮:sai1 须:xu1 发:fa1 鬓:bin4 颈:jing3
肩:jian1 胸:xiong1 背:bei4 腰:yao1 腹:fu4 臀:tun2 臂:bi4 肘:zhou3
腕:wan4 掌:zhang3 拳:quan2 趾:zhi3 腿:tui3 膝:xi1 脚:jiao3 踵:zhong3
骨:gu3 骼:ge2 筋:jin1 脉:mai4 血:xue4 肤:fu1 肌:ji1 肉:rou4 脂:zhi1
肪:fang2 心:xin1 肝:gan1 脾:pi2 肺:fei4 肾:shen4 胃:wei4 肠:chang2
胆:dan3 膀:pang2 胱:guang1 胰:yi2 脏:zang4 腑:fu3 髓:sui3 神:shen2
经:jing1 泪:lei4 汗:han4 涎:xian2 唾:tuo4 痰:tan2 尿:niao4 屎:shi3
疾:ji2 症:zheng4 疮:chuang1 疹:zhen3 疤:ba1 痕:hen2 瘤:liu2 癌:ai2
疫:yi4 瘟:wen1 痒:yang3 疼:teng2 酸:suan1 麻:ma2 肿:zhong3 胀:zhang4
晕:yun1 吐:tu4 泻:xie4 咳:ke2 嗽:sou4 喘:chuan3 烧:shao1 退:tui4
诊:zhen3 疗:liao2 症:zheng4 药:yao4 丸:wan2 散:san3 膏:gao1 丹:dan1
针:zhen1 灸:jiu3 剂:ji4 方:fang1 愈:yu4 康:kang1 健:jian4 壮:zhuang4
弱:ruo4 衰:shuai1 残:can2 瘫:tan1 聋:long2 哑:ya3 瞎:xia1 盲:mang2
""")

_add("""
跑:pao3 跳:tiao4 蹦:beng4 爬:pa2 滚:gun3 翻:fan1 滑:hua2 溜:liu1
踢:ti1 踩:cai3 踏:ta4 跨:kua4 迈:mai4 奔:ben1 冲:chong1 闯:chuang3
逃:tao2 避:bi4 躲:duo3 藏:cang2 追:zhui1 赶:gan3 逐:zhu2 寻:xun2
觅:mi4 捉:zhuo1 抓:zhua1 握:wo4 持:chi2 抬:tai2 举:ju3 提:ti2
拎:lin1 扛:kang2 挑:tiao1 抱:bao4 搂:lou3 搀:chan1 扶:fu2
拖:tuo1 拽:zhuai4 拔:ba2 插:cha1 摘:zhai1 采:cai3 拾:shi2 捡:jian3
扔:reng1 抛:pao1 丢:diu1 掷:zhi4 投:tou2 撒:sa1 洒:sa3 泼:po1
倒:dao3 灌:guan4 浇:jiao1 淋:lin2 滴:di1 流:liu2 淌:tang3 渗:shen4
挤:ji3 压:ya1 按:an4 揿:qin4 摁:en4 捏:nie1 掐:qia1 拧:ning2
搓:cuo1 揉:rou2 擦:ca1 抹:mo3 刮:gua1 削:xiao1 切:qie1 割:ge1
砍:kan3 劈:pi1 剁:duo4 斩:zhan3 刺:ci4 扎:zha1 戳:chuo1 捅:tong3
敲:qiao1 砸:za2 锤:chui2 捶:chui2 拍:pai1 搧:shan1 摸:mo1 抚:fu3
""")

_add("""
唱:chang4 吟:yin2 诵:song4 朗:lang3 吼:hou3 喊:han3 叫:jiao4 嚷:rang3
喧:xuan1 哗:hua2 吵:chao3 闹:nao4 吩:fen1 咐:fu4 嘱:zhu3 咛:ning2
唤:huan4 呼:hu1 喊:han3 唠:lao2 叨:dao1 聊:liao2 侃:kan3 谈:tan2
叙:xu4 述:shu4 讲:jiang3 评:ping2 议:yi4 辩:bian4 驳:bo2 争:zheng1
吻:wen3 亲:qin1 咬:yao3 嚼:jiao2 啃:ken3 吞:tun1 咽:yan4 含:han2
吮:shun3 吸:xi1 吹:chui1 呵:he1 哈:ha1 嘘:xu1 喷:pen1 吐:tu4
尝:chang2 品:pin3 饮:yin3 喝:he1 啜:chuo4 嚎:hao2 哭:ku1 泣:qi4
啼:ti2 嚏:ti4 哼:heng1 唧:ji1 咕:gu1 嘟:du1 喃:nan2 呻:shen1
吟:yin2 叹:tan4 吁:yu4 嗯:en4 哦:o4 呀:ya5 啊:a5 哎:ai1 唉:ai4
嘿:hei1 喂:wei4 嗨:hai1 哇:wa1 呜:wu1 嘻:xi1 嘲:chao2 讽:feng3
""")

_add("""
思:si1 虑:lv4 忖:cun3 琢:zhuo2 磨:mo2 悟:wu4 懂:dong3 晓:xiao3
忆:yi4 忘:wang4 犹:you2 豫:yu4 疑:yi2 惑:huo4 猜:cai1 测:ce4
断:duan4 判:pan4 析:xi1 辨:bian4 识:shi2 鉴:jian4 赏:shang3 析:xi1
愁:chou2 忧:you1 虑:lv4 烦:fan2 恼:nao3 闷:men4 郁:yu4 怒:nu4
愤:fen4 恨:hen4 怨:yuan4 恼:nao3 嫉:ji2 妒:du4 羡:xian4 慕:mu4
敬:jing4 仰:yang3 佩:pei4 崇:chong2 拜:bai4 尊:zun1 轻:qing1 蔑:mie4
鄙:bi3 视:shi4 厌:yan4 恶:e4 憎:zeng1 嫌:xian2 怜:lian2 悯:min3
惜:xi1 疼:teng2 宠:chong3 溺:ni4 惯:guan4 纵:zong4 慈:ci2 祥:xiang2
善:shan4 仁:ren2 慷:kang1 慨:kai3 吝:lin4 啬:se4 贪:tan1 婪:lan2
凶:xiong1 恶:e4 残:can2 忍:ren3 暴:bao4 虐:nve4 狠:hen3 毒:du2
骄:jiao1 傲:ao4 谦:qian1 虚:xu1 诚:cheng2 恳:ken3 虚:xu1 伪:wei3
狡:jiao3 猾:hua2 奸:jian1 诈:zha4 憨:han1 厚:hou4 朴:pu3 实:shi2
勇:yong3 敢:gan3 怯:qie4 懦:nuo4 胆:dan3 畏:wei4 惧:ju4 怖:bu4
慌:huang1 恐:kong3 吓:xia4 惶:huang2 悚:song3 骇:hai4 惴:zhui4
""")

_add("""
屋:wu1 宅:zhai2 寓:yu4 庐:lu2 舍:she3 棚:peng2 窝:wo1 巢:chao2
殿:dian4 宫:gong1 庙:miao4 寺:si4 庵:an1 塔:ta3 亭:ting2 阁:ge2
廊:lang2 轩:xuan1 榭:xie4 坛:tan2 台:tai2 榜:bang3 碑:bei1 坊:fang1
厦:sha4 仓:cang1 库:ku4 窖:jiao4 棚:peng2 圈:quan1 栏:lan2 厩:jiu4 槽:cao2
篱:li2 笆:ba1 栅:zha4 墩:dun1 桩:zhuang1 柱:zhu4 梁:liang2 檩:lin3
椽:chuan2 檐:yan2 瓦:wa3 砖:zhuan1 灰:hui1 浆:jiang1 泥:ni2 坯:pi1
础:chu3 基:ji1 奠:dian4 砌:qi4 筑:zhu4 盖:gai4 搭:da1 architecture:x1
""".replace("architecture:x1", "建:jian4"))

_add("""
舟:zhou1 船:chuan2 舶:bo2 艇:ting3 舰:jian4 帆:fan1 桨:jiang3 舵:duo4
锚:mao2 缆:lan3 渡:du4 航:hang2 驶:shi3 驾:jia4 骑:qi2 乘:cheng2
载:zai4 运:yun4 输:shu1 邮:you2 递:di4 寄:ji4 捎:shao1 携:xie2
轮:lun2 轨:gui3 辙:zhe2 辆:liang4 辕:yuan2 轴:zhou2 辐:fu2 毂:gu3
刹:sha1 闸:zha2 胎:tai1 篷:peng2 厢:xiang1 舱:cang1 翼:yi4 翅:chi4
降:jiang4 落:luo4 起:qi3 飘:piao1 翔:xiang2 翱:ao2 盘:pan2 旋:xuan2
坠:zhui4 堕:duo4 沉:chen2 浮:fu2 漂:piao1 泊:bo2 渡:du4 涉:she4
潜:qian2 泳:yong3 游:you2 溺:ni4 沐:mu4 浴:yu4 洗:xi3 涮:shuan4
漱:shu4 澡:zao3 淋:lin2 泡:pao4 浸:jin4 渍:zi4 湿:shi1 润:run4
燥:zao4 枯:ku1 萎:wei3 凋:diao1 谢:xie4 零:ling2 朽:xiu3 烂:lan4
腐:fu3 霉:mei2 馊:sou1 酵:jiao4 酿:niang4 熟:shu2 生:sheng1
""")

_add("""
剑:jian4 刀:dao1 枪:qiang1 炮:pao4 弹:dan4 箭:jian4 弓:gong1 弩:nu3
矛:mao2 盾:dun4 斧:fu3 钺:yue4 戟:ji3 鞭:bian1 锏:jian3 锤:chui2
甲:jia3 盔:kui1 胄:zhou4 旗:qi2 鼓:gu3 号:hao4 角:jiao3 营:ying2
寨:zhai4 堡:bao3 垒:lei3 壕:hao2 堑:qian4 哨:shao4 岗:gang3 卫:wei4
兵:bing1 卒:zu2 将:jiang1 帅:shuai4 军:jun1 师:shi1 旅:lv3 团:tuan2
连:lian2 排:pai2 班:ban1 伍:wu3 列:lie4 阵:zhen4 敌:di2 寇:kou4
匪:fei3 贼:zei2 盗:dao4 侠:xia2 勇:yong3 猛:meng3 悍:han4 骁:xiao1
攻:gong1 守:shou3 防:fang2 御:yu4 抗:kang4 拒:ju4 叛:pan4
征:zheng1 讨:tao3 伐:fa2 剿:jiao3 灭:mie4 歼:jian1 俘:fu2 虏:lu3
胜:sheng4 败:bai4 溃:kui4 逃:tao2 退:tui4 撤:che4 围:wei2 困:kun4
""")

_add("""
琴:qin2 棋:qi2 书:shu1 画:hua4 笔:bi3 墨:mo4 纸:zhi3 砚:yan4
毫:hao2 宣:xuan1 帖:tie4 碑:bei1 拓:ta4 裱:biao3 轴:zhou2 卷:juan4
册:ce4 篇:pian1 章:zhang1 段:duan4 句:ju4 词:ci2 诗:shi1 赋:fu4
歌:ge1 曲:qu3 谣:yao2 谚:yan4 联:lian2 对:dui4 谜:mi2 典:dian3
籍:ji2 著:zhu4 作:zuo4 编:bian1 撰:zhuan4 译:yi4 校:jiao4 刊:kan1
版:ban3 印:yin4 刷:shua1 订:ding4 装:zhuang1 帧:zhen1 封:feng1
皮:pi2 扉:fei1 序:xu4 跋:ba2 录:lu4 附:fu4 注:zhu4 释:shi4
阅:yue4 览:lan3 读:du2 诵:song4 背:bei4 默:mo4 抄:chao1 写:xie3
描:miao2 绘:hui4 涂:tu2 染:ran3 勾:gou1 勒:le4 刻:ke4 雕:diao1
塑:su4 铸:zhu4 锻:duan4 琢:zhuo2 嵌:qian4 镶:xiang1 贴:tie1 粘:zhan1
""")

_add("""
乒:ping1 乓:pang1 羽:yu3 篮:lan2 锻:duan4 炼:lian4 操:cao1 赛:sai4
竞:jing4 夺:duo2 冠:guan4 亚:ya4 季:ji4 殿:dian4 输:shu1 赢:ying2
甲:jia3 乙:yi3 丙:bing3 丁:ding1 戊:wu4 庚:geng1 辛:xin1 壬:ren2
癸:gui3 丑:chou3 寅:yin2 卯:mao3 辰:chen2 巳:si4 戌:xu1 亥:hai4
鼠:shu3 丑:chou3 虎:hu3 兔:tu4 龙:long2 蛇:she2 马:ma3 羊:yang2
猴:hou2 鸡:ji1 狗:gou3 猪:zhu1 节:jie2 庆:qing4 祝:zhu4 贺:he4
寿:shou4 婚:hun1 嫁:jia4 娶:qu3 聘:pin4 媒:mei2 妁:shuo4 嫁:jia4
丧:sang1 葬:zang4 墓:mu4 坟:fen2 冢:zhong3 陵:ling2 祭:ji4 祀:si4
祷:dao3 拜:bai4 香:xiang1 烛:zhu2 鞭:bian1 炮:pao4 灯:deng1 笼:long2
联:lian2 幅:fu2 桃:tao2 符:fu2 压:ya1 岁:sui4 饺:jiao3 粽:zong4
月:yue4 饼:bing3 灯:deng1 谜:mi2 龙:long2 舟:zhou1 秧:yang1 歌:ge1
""")

_add("""
呆:dai1 傻:sha3 笨:ben4 蠢:chun3 愚:yu2 痴:chi1 聪:cong1 慧:hui4
智:zhi4 颖:ying3 敏:min3 捷:jie2 灵:ling2 巧:qiao3 拙:zhuo1 钝:dun4
伶:ling2 俐:li4 乖:guai1 顽:wan2 淘:tao2 皮:pi2 捣:dao3 蛋:dan4
懒:lan3 惰:duo4 勤:qin2 奋:fen4 刻:ke4 苦:ku3 辛:xin1 劳:lao2
累:lei4 倦:juan4 疲:pi2 乏:fa2 困:kun4 盹:dun3 寐:mei4 眠:mian2
睡:shui4 醒:xing3 寤:wu4 梦:meng4 魇:yan3 鼾:han1 寝:qin3 憩:qi4
歇:xie1 息:xi1 休:xiu1 闲:xian2 暇:xia2 忙:mang2 碌:lu4 匆:cong1
促:cu4 缓:huan3 慢:man4 迟:chi2 钝:dun4 疾:ji2 迅:xun4 捷:jie2
速:su4 骤:zhou4 徐:xu2 渐:jian4 悄:qiao1 寂:ji4 肃:su4 mute:x1
""".replace("mute:x1", "默:mo4"))

_add("""
仿:fang3 佛:fo2 彷:pang2 徨:huang2 徘:pai2 徊:huai2 彳:chi4 亍:chu4
逍:xiao1 遥:yao2 逗:dou4 遛:liu4 逛:guang4 巡:xun2 逻:luo2 辑:ji2
逼:bi1 迫:po4 逮:dai4 逢:feng2 遭:zao1 遇:yu4 遵:zun1 循:xun2
遗:yi2 遣:qian3 遏:e4 遮:zhe1 掩:yan3 蔽:bi4 遁:dun4 遂:sui4
逝:shi4 逸:yi4 迄:qi4 迂:yu1 迥:jiong3 迢:tiao2 迤:yi3 逦:li3
迸:beng4 迭:die2 迦:jia1 迩:er3 迫:po4 述:shu4 迷:mi2 迹:ji4
追:zhui1 逆:ni4 送:song4 适:shi4 选:xuan3 逊:xun4 递:di4 逐:zhu2
途:tu2 通:tong1 逝:shi4 造:zao4 逡:qun1 逵:kui2 逶:wei1 逮:dai4
週:zhou1 進:jin4 运:yun4 遍:bian4 过:guo4 达:da2 违:wei2 连:lian2
迎:ying2 还:hai2 返:fan3 近:jin4 远:yuan3 退:tui4 迁:qian1 边:bian1
""")

_add("""
江:jiang1 汉:han4 汪:wang1 汹:xiong1 涌:yong3 沸:fei4 腾:teng2
澎:peng2 湃:pai4 滔:tao1 潺:chan2 淙:cong2 汩:gu3 涓:juan1 滂:pang1
沱:tuo2 瀑:pu4 溅:jian4 漩:xuan2 涡:wo1 漪:yi1 澜:lan2 沫:mo4
泡:pao4 沫:mo4 涟:lian2 潋:lian4 滟:yan4 澈:che4 澄:cheng2 浊:zhuo2
混:hun4 沌:dun4 淤:yu1 淀:dian4 沉:chen2 淹:yan1 溢:yi4 泛:fan4
滥:lan4 涸:he2 竭:jie2 涩:se4 润:run4 泽:ze2 沛:pei4 沃:wo4
浇:jiao1 灌:guan4 溉:gai4 排:pai2 渠:qu2 沟:gou1 渎:du2 浍:kuai4
泾:jing1 渭:wei4 洛:luo4 汾:fen2 淮:huai2 泗:si4 湘:xiang1 沅:yuan2
澧:li3 赣:gan4 闽:min3 滦:luan2 辽:liao2 鸭:ya1 绿:lv4 黑:hei1
松:song1 嫩:nen4 乌:wu1 苏:su1 里:li3 雅:ya3 砻:long2 怒:nu4
澜:lan2 沧:cang1 金:jin1 雅:ya3 布:bu4 江:jiang1
""")

_add("""
晤:wu4 晦:hui4 暝:ming2 曦:xi1 曙:shu3 暮:mu4 晖:hui1 晟:sheng4
昱:yu4 晗:han2 昊:hao4 昶:chang3 晏:yan4 曜:yao4 曝:pu4 晒:shai4
暄:xuan1 煦:xu4 熙:xi1 炎:yan2 焱:yan4 炙:zhi4 灼:zhuo2 焚:fen2
燎:liao2 焰:yan4 熄:xi1 烬:jin4 燃:ran2 爆:bao4 炸:zha4 烹:peng1
饪:ren4 煎:jian1 熬:ao2 炖:dun4 焖:men4 煨:wei1 烩:hui4 炒:chao3
爆:bao4 熘:liu1 炝:qiang4 汆:cuan1 涮:shuan4 烤:kao3 烘:hong1
焙:bei4 蒸:zheng1 煮:zhu3 沏:qi1 泡:pao4 酌:zhuo2 斟:zhen1 酬:chou2
馋:chan2 饿:e4 饥:ji1 渴:ke3 饱:bao3 胀:zhang4 撑:cheng1 噎:ye1
""")

_add("""
它:ta1 趴:pa1 蹲:dun1 跪:gui4 躺:tang3 卧:wo4 倚:yi3 靠:kao4
歪:wai1 斜:xie2 倾:qing1 仄:ze4 侧:ce4 仰:yang3 俯:fu3 偃:yan3
站:zhan4 伫:zhu4 矗:chu4 耸:song3 屹:yi4 挺:ting3 拔:ba2 峙:zhi4
蹲:dun1 踞:ju4 盘:pan2 踮:dian3 跂:qi3 跃:yue4 蹿:cuan1 窜:cuan4
纵:zong4 跌:die1 摔:shuai1 绊:ban4 趔:lie4 趄:qie4 踉:liang4 跄:qiang4
蹒:pan2 跚:shan1 匍:pu2 匐:fu2 蜷:quan2 缩:suo1 舒:shu1 展:zhan3
伸:shen1 屈:qu1 弯:wan1 拱:gong3 耷:da1 拉:la1 垂:chui2
昂:ang2 扬:yang2 翘:qiao4 撅:jue1 噘:jue1 耸:song3 缩:suo1 扭:niu3
""")

_add("""
份:fen4 伙:huo3 伴:ban4 侣:lv3 俦:chou2 僚:liao2 侪:chai2 辈:bei4
伦:lun2 群:qun2 伙:huo3 帮:bang1 派:pai4 系:xi4 党:dang3 羽:yu3
徒:tu2 弟:di4 生:sheng1 员:yuan2 士:shi4 者:zhe3 家:jia1 匠:jiang4
师:shi1 傅:fu4 手:shou3 工:gong1 农:nong2 商:shang1 贩:fan4
佣:yong1 仆:pu2 婢:bi4 奴:nu2 隶:li4 役:yi4 吏:li4
宦:huan4 臣:chen2 君:jun1 帝:di4 皇:huang2 后:hou4 妃:fei1 嫔:pin2
储:chu3 太:tai4 监:jian1 相:xiang1 卿:qing1 侯:hou2 爵:jue2 勋:xun1
绅:shen1 豪:hao2 霸:ba4 枭:xiao1 雄:xiong2 杰:jie2 俊:jun4 彦:yan4
贤:xian2 哲:zhe2 圣:sheng4 儒:ru2 僧:seng1 尼:ni2 道:dao4 仙:xian1
佛:fo2 祖:zu3 宗:zong1 嗣:si4 裔:yi4 胄:zhou4 孙:sun1 甥:sheng1
婿:xu4 翁:weng1 姑:gu1 嫜:zhang1 妯:zhou2 娌:li3 connect:x1
""".replace("connect:x1", "眷:juan4"))

_add("""
楼:lou2 群:qun2 座:zuo4 幢:zhuang4 栋:dong4 间:jian1 套:tao4
厦:sha4 邸:di3 墅:shu4 苑:yuan4 庄:zhuang1 园:yuan2 圃:pu3 畦:qi2
垄:long3 亩:mu3 顷:qing3 畈:fan4 田:tian2 陌:mo4 阡:qian1 埂:geng3
堰:yan4 圩:wei2 垸:yuan4 坪:ping2 坂:ban3 垅:long3 壤:rang3 埃:ai1
尘:chen2 垢:gou4 秽:hui4 污:wu1 浊:zhuo2 洁:jie2 净:jing4 清:qing1
爽:shuang3 晶:jing1 莹:ying2 剔:ti1 透:tou4 澈:che4 混:hun4 浑:hun2
朦:meng2 胧:long2 模:mo2 糊:hu2 隐:yin3 约:yue1 依:yi1 稀:xi1
缥:piao1 缈:miao3 虚:xu1 幻:huan4 渺:miao3 茫:mang2 苍:cang1 茫:mang2
辽:liao2 阔:kuo4 广:guang3 袤:mao4 浩:hao4 瀚:han4 磅:bang4 礴:bo2
巍:wei1 峨:e2 嶙:lin2 峋:xun2 陡:dou3 峭:qiao4 峻:jun4 险:xian3
崎:qi2 岖:qu1 坎:kan3 坷:ke3 泞:ning4 洼:wa1 凸:tu1 凹:ao1
""")

_add("""
乃:nai3 廿:nian4 卅:sa4 兹:zi1 倘:tang3 倘:tang3 庶:shu4 孰:shu2
曷:he2 盍:he2 奚:xi1 胡:hu2 焉:yan1 耶:ye2 欤:yu2 哉:zai1
矣:yi3 乎:hu1 也:ye3 兮:xi1 尔:er3 汝:ru3 吾:wu2 余:yu2 予:yu3
朕:zhen4 孤:gu1 寡:gua3 仆:pu2 妾:qie4 君:jun1 卿:qing1 子:zi3
氏:shi4 甫:fu3 曰:yue1 云:yun2 谓:wei4 诸:zhu1 之:zhi1 乎:hu1
者:zhe3 邪:xie2 噫:yi1 吁:yu4 嗟:jie1 呜:wu1 呼:hu1 嗟:jie1
亦:yi4 悉:xi1 咸:xian2 皆:jie1 俱:ju4 均:jun1 悉:xi1 遍:bian4
凡:fan2 every:x1
""".replace("every:x1", "诸:zhu1"))

_add("""
霞:xia2 浦:pu3 衙:ya2 旗:qi2 窑:yao2 猛:meng3 涨:zhang3 崩:beng1
殂:cu2 疲:pi2 弊:bi4 诚:cheng2 危:wei1 急:ji2 存:cun2 亡:wang2
秋:qiu1 标:biao1 兵:bing1 奔:ben1 坡:po1 炮:pao4 并:bing4 排:pai2
跑:pao3 碰:peng4 肥:fei2 挥:hui1 导:dao3 航:hang2 驾:jia4 规:gui1
划:hua4 团:tuan2 优:you1 惠:hui4 拥:yong1 精:jing1 准:zhun3 驶:shi3
帝:di4 创:chuang4 崩:beng1 益:yi4 州:zhou1 三:san1 wei:x1
""".replace("wei:x1", "位:wei4"))

_add("""
春:chun1 夏:xia4 秋:qiu1 冬:dong1 季:ji4 雨:yu3 雪:xue3 霜:shuang1
雷:lei2 闪:shan3 云:yun2 雾:wu4 露:lu4 冰:bing1 寒:han2 暖:nuan3
凉:liang2 晴:qing2 阴:yin1 阳:yang2 晨:chen2 午:wu3 昏:hun1 夕:xi1
宵:xiao1 旦:dan4 旬:xun2 湖:hu2 河:he2 溪:xi1 泉:quan2 井:jing3
池:chi2 塘:tang2 坝:ba4 堤:di1 岸:an4 滩:tan1 岛:dao3 湾:wan1
洋:yang2 浪:lang4 潮:chao2 波:bo1 涛:tao1 洪:hong2 灾:zai1 旱:han4
沙:sha1 漠:mo4 泥:ni2 岩:yan2 矿:kuang4 煤:mei2 铁:tie3 铜:tong2
银:yin2 铝:lv3 锡:xi1 锌:xin1 钢:gang1 玉:yu4 珠:zhu1 宝:bao3
坡:po1 峰:feng1 岭:ling3 崖:ya2 谷:gu3 洞:dong4 穴:xue2 丘:qiu1
陵:ling2 森:sen1 枝:zhi1 叶:ye4 茎:jing1 芦:lu2 苇:wei3 竹:zhu2
松:song1 柏:bai3 柳:liu3 槐:huai2 桑:sang1 枫:feng1 杉:shan1 桂:gui4
菊:ju2 荷:he2 莲:lian2 梅:mei2 樱:ying1 草:cao3 苔:tai2 藤:teng2
刺:ci4 蕊:rui3 瓣:ban4 朵:duo3 丛:cong2 芽:ya2 苗:miao2 棵:ke1
""")

_add("""
饭:fan4 菜:cai4 汤:tang1 粥:zhou1 饼:bing3 馒:man2 饺:jiao3 糖:tang2
盐:yan2 油:you2 酱:jiang4 醋:cu4 椒:jiao1 姜:jiang1 蒜:suan4 葱:cong1
茶:cha2 奶:nai3 豆:dou4 腐:fu3 蛋:dan4 肉:rou4 鸡:ji1 鸭:ya1 鹅:e2
鱼:yu2 虾:xia1 蟹:xie4 牛:niu2 羊:yang2 猪:zhu1 狗:gou3 猫:mao1
兔:tu4 鼠:shu3 虎:hu3 狮:shi1 熊:xiong2 狼:lang2 鹿:lu4 猴:hou2
蛇:she2 龙:long2 凤:feng4 鸟:niao3 鹰:ying1 鸽:ge1 雀:que4 燕:yan4
鹤:he4 鸦:ya1 鹊:que4 蜂:feng1 蝶:die2 蚁:yi3 蚊:wen2 蝇:ying2
蛙:wa1 龟:gui1 虫:chong2 蚕:can2 蜘:zhi1 蛛:zhu1 蝉:chan2 稻:dao4
麦:mai4 粮:liang2 秧:yang1 瓜:gua1 桃:tao2 梨:li2 杏:xing4 枣:zao3
柿:shi4 葡:pu2 萄:tao2 莓:mei2 蕉:jiao1 菠:bo1 萝:luo2 卜:bo5
芹:qin2 薯:shu3 芋:yu4 笋:sun3 菇:gu1 藕:ou3 椰:ye1 栗:li4
橘:ju2 餐:can1 厨:chu2 灶:zao4 锅:guo1 碗:wan3 筷:kuai4 勺:shao2
盘:pan2 杯:bei1 壶:hu2 瓶:ping2 罐:guan4 炉:lu2 烟:yan1 灯:deng1
烛:zhu2 镜:jing4 梳:shu1 刷:shua1 巾:jin1 皂:zao4 盆:pen2 桶:tong3
伞:san3 鞋:xie2 袜:wa4 帽:mao4 裤:ku4 裙:qun2 衫:shan1 袖:xiu4
扣:kou4 针:zhen1 剪:jian3 尺:chi3 棉:mian2 绸:chou2 革:ge2 毯:tan3
褥:ru4 枕:zhen3 毡:zhan1 床:chuang2 桌:zhuo1 椅:yi3 凳:deng4 柜:gui4
箱:xiang1 袋:dai4 窗:chuang1 帘:lian2 墙:qiang2 梯:ti1 层:ceng2
楼:lou2 顶:ding3 底:di3 哥:ge1 弟:di4 姑:gu1 娘:niang2 叔:shu1
舅:jiu4 爷:ye2 奶:nai3 婆:po2 孙:sun1 嫂:sao3 侄:zhi2 媳:xi2
伯:bo2 婶:shen3 姨:yi2 舍:she3 宿:su4 邻:lin2 卧:wo4 厅:ting1
""")

_add("""
网:wang3 改:gai3 参:can1 与:yu3 议:yi4 试:shi4 验:yan4 屋:wu1
设:she4 备:bei4 软:ruan3 硬:ying4 件:jian4 登:deng1 录:lu4 账:zhang4
号:hao4 密:mi4 码:ma3 邮:you2 短:duan3 脑:nao3 表:biao3 视:shi4
频:pin2 照:zhao4 册:ce4 浏:liu2 览:lan3 搜:sou1 索:suo3 引:yin3
擎:qing2 付:fu4 微:wei1 扫:sao3 退:tui4 货:huo4 递:di4 卖:mai4
厅:ting1 单:dan1 宽:kuan1 带:dai4 由:you2 器:qi4 插:cha1 座:zuo4
池:chi2 充:chong1 堂:tang2 授:shou4 课:ke4 绩:ji4 毕:bi4 辩:bian4
导:dao3 辅:fu3 硕:shuo4 博:bo2 聘:pin4 简:jian3 历:li4 职:zhi2
辞:ci2 薪:xin1 酬:chou2 签:qian1 订:ding4 预:yu4 馆:guan3 宾:bin1
折:zhe2 斑:ban1 幼:you4 端:duan1 舞:wu3 蹈:dao3 泳:yong3 棋:qi2
扑:pu1 克:ke4 麻:ma2 将:jiang1 瑜:yu2 伽:jia1 999:x1
""".replace("999:x1", "律:lv4"))

_add("""
习:xi2 享:xiang3 伟:wei3 恒:heng2 慎:shen4 旨:zhi3 杂:za2 漫:man4
牌:pai2 环:huan2 碳:tan4 绕:rao4 腻:ni4 荡:dang4 谨:jin3 配:pei4
醉:zui4 颗:ke1 食:shi2 饮:yin3 欲:yu4 释:shi4 鉴:jian4 隔:ge2 丰:feng1 顿:dun4 您:nin2 咱:zan2 啥:sha2 嘛:ma5 哟:yo5 哦:o4 呗:bei5 咋:za3
488:x1
""".replace("488:x1", "障:zhang4"))

# ---------------------------------------------------------------------------
# Coverage extension (round 3): jieba's frequency dict (the only CJK corpus
# statistic available in this environment) ranked all hanzi by corpus
# frequency; every legitimate character in the top ~3500 that was neither
# curated nor reachable by collation propagation is curated here (mojibake
# artifacts from GBK-decoded entries in jieba's dict are excluded).
# ---------------------------------------------------------------------------

_add("""
族:zu2 增:zeng1 型:xing2 属:shu3 构:gou4 料:liao4 占:zhan4 央:yang1 斗:dou4
若:ruo4 杀:sha1 态:tai4 修:xiu1 效:xiao4 协:xie2 财:cai2 阶:jie1 害:hai4
超:chao1 温:wen1 止:zhi3 执:zhi2 普:pu3 免:mian3 材:cai2 括:kuo4 乱:luan4
尚:shang4 良:liang2 激:ji1 邦:bang1 欧:ou1 宜:yi2 块:kuai4 错:cuo4 够:gou4
某:mou3 鲜:xian1 冷:leng3 训:xun4 否:fou3 督:du1 控:kong4 忽:hu1 纳:na4
介:jie4 召:zhao4 暗:an4 扩:kuo4 恩:en1 届:jie4 植:zhi2 固:gu4 补:bu3
唐:tang2 俄:e2 旧:jiu4 旁:pang2 牙:ya2 稳:wen3 概:gai4 托:tuo1 肯:ken3
缺:que1 罢:ba4 嘴:zui3 巨:ju4 培:pei2 廷:ting2 脱:tuo1 繁:fan2 侵:qin1
秀:xiu4 横:heng2 坏:huai4 坦:tan3 瞧:qiao2 播:bo1 延:yan2 访:fang3
震:zhen4 殖:zhi2 吨:dun1 纷:fen1 仪:yi2 狐:hu2 融:rong2 抵:di3 塞:sai1
液:ye4 偏:pian1 替:ti4 盟:meng2 挂:gua4 铺:pu4 鬼:gui3 纯:chun2 睛:jing1
隆:long2 谋:mou2 奉:feng4 摆:bai3 措:cuo4 嘉:jia1 废:fei4 搞:gao3 胞:bao1
俗:su2 阻:zu3 奏:zou4 孝:xiao4 裁:cai2 啦:la5 纺:fang3 丈:zhang4 泰:tai4
剩:sheng4 申:shen1 贫:pin2 诺:nuo4 贡:gong4 爹:die1 贝:bei4 映:ying4
骂:ma4 努:nu3 赞:zan4 患:huan4 伏:fu2 劲:jin4 贯:guan4 彻:che4 衡:heng2
郎:lang2 磁:ci2 瑞:rui4 貌:mao4 毁:hui3 昨:zuo2 抽:chou1 尸:shi1 龄:ling2
趣:qu4 浓:nong2 鸿:hong2 穷:qiong2 荒:huang1 戴:dai4 妙:miao4 胖:pang4
趋:qu1 锦:jin3 悬:xuan2 摄:she4 戒:jie4 粗:cu1 狂:kuang2 偷:tou1 稍:shao1
撞:zhuang4 堆:dui1 曼:man4 碎:sui4 魔:mo2 仗:zhang4 冈:gang1 菌:jun1
暂:zan4 凝:ning2 恰:qia4 劝:quan4 莱:lai2 拟:ni3 姆:mu3 轰:hong1 粒:li4
溶:rong2 魂:hun2 腊:la4 耐:nai4 辉:hui1 乳:ru3 陪:pei2 颇:po1 浅:qian3
姊:zi3 惨:can3 添:tian1 详:xiang2 纤:xian1 柔:rou2 档:dang4 覆:fu4
绣:xiu4 娃:wa2 扇:shan4 凯:kai3 锁:suo3 帐:zhang4 埋:mai2 壳:ke2
挡:dang3 甜:tian2 玄:xuan2 谱:pu3 乾:qian2 填:tian2 钻:zuan1 徽:hui1
扰:rao3 匹:pi3 穆:mu4 邀:yao1 芳:fang1 棒:bang4 耕:geng1 艘:sou1
卵:luan3 滋:zi1 柴:chai2 碍:ai4 拨:bo1 挖:wa1 腔:qiang1 秒:miao3
允:yun3 拆:chai1 辟:pi4 敦:dun1 厘:li2 悠:you1 妖:yao1 孟:meng4
畅:chang4 迪:di2 搬:ban1 奈:nai4 辣:la4 幽:you1 耀:yao4 殷:yin1
纠:jiu1 寸:cun4 弥:mi2 晃:huang4 吊:diao4 哩:li5 稿:gao3 娜:na4
拼:pin1 欺:qi1 囊:nang2 堪:kan1 棺:guan1 俩:lia3 缝:feng2 藻:zao3
辱:ru3 扯:che3 糕:gao1 漏:lou4 催:cui1 踪:zong1 杖:zhang4 腺:xian4
绳:sheng2 漆:qi1 夷:yi2 阀:fa2 卑:bei1 仔:zi3 庸:yong1 瘦:shou4
赐:ci4 扮:ban4 砂:sha1 刃:ren4 碱:jian3 钦:qin1 庞:pang2 叉:cha1
泄:xie4 艾:ai4 蓉:rong2 夸:kua1 抖:dou3 瑶:yao2 袍:pao2 坑:keng1
串:chuan4 锐:rui4 颤:chan4 滨:bin1 履:lv3 喀:ka1 扁:bian3 罕:han3
磷:lin2 帕:pa4 镑:bang4 贞:zhen1 禧:xi3 妥:tuo3 筒:tong3 禀:bing3
诱:you4 陀:tuo2 倡:chang4 矩:ju3 翠:cui4 煌:huang2 茂:mao4 氛:fen1
戈:ge1 弗:fu2 悔:hui3 拐:guai3 鼎:ding3 幺:yao1 芬:fen1 蛮:man2
醇:chun2 棍:gun4 宙:zhou4 酷:ku4 郧:yun2 欠:qian4 孕:yun4 姚:yao2
昭:zhao1 盼:pan4 舆:yu2 斋:zhai1 脆:cui4 璋:zhang1 钉:ding1 棣:di4
丫:ya1 宰:zai3 阐:chan3 挨:ai1 霖:lin2 哄:hong3 涔:cen2 戚:qi1
擅:shan4 赌:du3 隋:sui2 肖:xiao4 饶:rao2 雇:gu4 罩:zhao4 丐:gai4
誓:shi4 冤:yuan1 坤:kun1 屁:pi4 宛:wan3 矮:ai3 潭:tan2 渊:yuan1
俺:an3 喇:la3 堵:du3 蒂:di4 颠:dian1 羞:xiu1 佐:zuo3 瞬:shun4
挽:wan3 禅:chan2 屯:tun2 韵:yun4 肴:yao2 螺:luo2 凑:cou4 钧:jun1
蜜:mi4 愧:kui4 栽:zai1 苯:ben3 肆:si4 尹:yin3 窄:zhai3 谭:tan2
窟:ku1 瞪:deng4 蔬:shu1 糟:zao1 匾:bian3 妄:wang4 沔:mian3 耻:chi3
旭:xu4 硅:gui1 雌:ci2 攀:pan1 惹:re3 裹:guo3 擒:qin2 鳞:lin2
浣:huan4 叩:kou4 掀:xian1 屡:lv3 瞒:man2 璇:xuan2 厮:si1 钩:gou1
隙:xi4 丞:cheng2 盯:ding1 爪:zhua3 阙:que4 彪:biao1 虹:hong2
衍:yan3 甸:dian4 鳍:qi2 巩:gong3 熔:rong2 磕:ke1 焕:huan4 衷:zhong1
捞:lao1 卦:gua4 蜡:la4 挪:nuo2 氯:lv4 晌:shang3 蹄:ti2 粑:ba1
兀:wu4 缔:di4 蕴:yun4 勉:mian3 匀:yun2 灏:hao4 驼:tuo2 撕:si1
愣:leng4 斌:bin1 麋:mi2 薛:xue1 缴:jiao3 寰:huan2 躯:qu1 颂:song4
佑:you4 绑:bang3 仑:lun2 镖:biao1 钠:na4 妆:zhuang1 禾:he2 驴:lv2
耍:shua3 娥:e2 啸:xiao4 骚:sao1 亨:heng1 勘:kan1 挫:cuo4 凿:zao2
塌:ta1 咖:ka1 钙:gai4 框:kuang4 锥:zhui1 怡:yi2 魄:po4 橡:xiang4
盏:zhan3 赦:she4 沼:zhao3 瑰:gui1 婉:wan3 卤:lu3 躁:zao4 淳:chun2
凛:lin3 剖:pou1 蕲:qi2 姥:lao3 兜:dou1 璧:bi4 趟:tang4 裸:luo3
粹:cui4 瞻:zhan1 乞:qi3 炕:kang4 垮:kua3 拘:ju1 笛:di2 鹃:juan1
鞍:an1 犬:quan3 弧:hu2 腥:xing1 裘:qiu2 灿:can4 摧:cui1 棱:leng2
梢:shao1 钊:zhao1 糯:nuo4 畔:pan4 缅:mian3 襟:jin1 拢:long3 胪:lu2
叮:ding1 榨:zha4 沾:zhan1 枉:wang3 辜:gu1 瑟:se4 萍:ping2 嫣:yan1
胺:an4 甩:shuai3 陂:bei1 钓:diao4 暑:shu3 傍:bang4 睹:du3 缁:zi1
贬:bian3 胚:pei1 莎:sha1 囚:qiu2 藩:fan1 蹇:jian3 膊:bo2 恍:huang3
绮:qi3 邵:shao4 耽:dan1 烫:tang4 昼:zhou4 勿:wu4 桓:huan2 歉:qian4
膳:shan4 敛:lian3 狄:di2 沽:gu1 揪:jiu1 牡:mu3 锣:luo2 瀛:ying2
缮:shan4 咀:ju3 雍:yong1 铲:chan3 厄:e4 弘:hong2 尴:gan1 衢:qu2
垃:la1 郝:hao3 挠:nao2 莽:mang3 瑙:nao3 瞄:miao2 呐:na4 歹:dai3
豚:tun2 魁:kui2 诧:cha4 鞑:da2 谎:huang3 尬:ga4 咒:zhou4 梭:suo1
涅:nie4 杈:cha4 娟:juan1 敷:fu1 撇:pie3 氮:dan4 潇:xiao1 郢:ying3
粪:fen4 谴:qian3 隧:sui4 簇:cu4 礁:jiao1 衮:gun3 濂:lian2 鲟:xun2
彝:yi2 斐:fei3 卞:bian4 祁:qi2 耿:geng3 敞:chang3 汰:tai4 魅:mei4
鞘:qiao4 讶:ya4 琐:suo3 滤:lv4 锰:meng3 瑚:hu2 稽:ji1 蒿:hao1
煞:sha4 泵:beng4 拈:nian1 骡:luo2 肇:zhao4 砰:peng1 葫:hu2 梗:geng3
僻:pi4 鳌:ao2 捆:kun3 跺:duo4 豁:huo4 睿:rui4 湛:zhan4 酥:su1
眨:zha3 惕:ti4 岔:cha4 稼:jia4 邹:zou1 灞:ba4 匣:xia2 陋:lou4
羌:qiang1 聂:nie4 莉:li4 芜:wu2 琛:chen1 扳:ban1 呕:ou3 酚:fen1
蔗:zhe4 彬:bin1 拇:mu3 窥:kui1 羹:geng1 匕:bi3 哺:bu3 倪:ni2
瞩:zhu3 檀:tan2 缀:zhui4 瞥:pie1 簿:bu4 缉:ji1 皋:gao1 楠:nan2
萌:meng2 斡:wo4 烷:wan2 绽:zhan4 匙:chi2 谬:miu4 剌:la2 撮:cuo1
熏:xun1 碾:nian3 亢:kang4 垦:ken3 彰:zhang1 梓:zi3 啪:pa1 诰:gao4
驹:ju1 嗡:weng1 羁:ji1 汞:gong3 嚣:xiao1 辫:bian4 惭:can2 蠡:li2
咧:lie3 漳:zhang1 孢:bao1 缕:lv3 炯:jiong3 嵩:song1 唬:hu3 濒:bin1
鳙:yong1 筛:shai1 殉:xun4 霎:sha4 椭:tuo3 咯:lo5 眯:mi1 眶:kuang4
鸪:gu1 靡:mi3 嘶:si1 孽:nie4 饵:er3 咚:dong1 敕:chi4 蔓:man4
憋:bie1 鹧:zhe4 笃:du3 懿:yi4 骸:hai2 摹:mo2 磋:cuo1 吭:keng1
拣:jian3 骞:qian1 乍:zha4 鳄:e4 酯:zhi3 绰:chuo4 渣:zha1 鸠:jiu1
脓:nong2 闺:gui1 譬:pi4 钛:tai4 奎:kui2 揣:chuai3 茸:rong2 畸:ji1
怦:peng1 靶:ba3 攒:zan3 蕾:lei3 馨:xin1 廖:liao4 葵:kui2 丕:pi1
舜:shun4 鲨:sha1 逞:cheng3 诬:wu1 苟:gou3 廓:kuo4 镍:nie4 槛:kan3
牟:mou2 鸳:yuan1 俏:qiao4 芥:jie4 麟:lin2 悼:dao4 楞:leng2 倭:wo1
楷:kai3 柑:gan1 馈:kui4 孜:zi1 韬:tao1 鸯:yang1 蒯:kuai3 紊:wen3
酰:xian1 佬:lao3 妮:ni1 蚌:bang4 沁:qin4 噶:ga2 剃:ti4 锭:ding4
娑:suo1 琅:lang2 褂:gua4 轧:ya4 褶:zhe3 觑:qu4 篆:zhuan4 醛:quan2
洽:qia4 绉:zhou4 扼:e4 簧:huang2 砥:di3 撬:qiao4 慑:she4 嗅:xiu4
鲢:lian2 冉:ran3 胤:yin4 攘:rang3 蜿:wan1 裳:shang5 霄:xiao1
瘾:yin3 捻:nian3 吆:yao1 瞰:kan4 竿:gan1 姹:cha4 隘:ai4 靴:xue1
狸:li2 讥:ji1 擂:lei2 豌:wan1 秭:zi3 鲸:jing1 苛:ke1 镁:mei3
梵:fan4 垛:duo3 颅:lu2 讧:hong4 咦:yi2 嘎:ga1 涕:ti4 俸:feng4
纂:zuan3 嗜:shi4 札:zha2 噢:o1 锛:ben1 浜:bang1 澶:chan2 垱:dang4
褰:qian1 簡:jian3 購:gou4 窦:dou4
""")

PHRASES = {}


def _phr(s):
    for line in s.strip().split("\n"):
        word, pys = line.split(":")
        pys = pys.split()
        assert len(word) == len(pys), line
        PHRASES[word] = pys


_phr("""
不是:bu2 shi4
不会:bu2 hui4
不要:bu2 yao4
不过:bu2 guo4
不错:bu2 cuo4
不必:bu2 bi4
不到:bu2 dao4
不断:bu2 duan4
不但:bu2 dan4
不论:bu2 lun4
不再:bu2 zai4
不见:bu2 jian4
不对:bu2 dui4
不够:bu2 gou4
银行:yin2 hang2
行业:hang2 ye4
行列:hang2 lie4
一行:yi4 hang2
发行:fa1 xing2
行为:xing2 wei2
行动:xing2 dong4
还是:hai2 shi4
还有:hai2 you3
还原:huan2 yuan2
归还:gui1 huan2
还款:huan2 kuan3
重要:zhong4 yao4
重量:zhong4 liang4
重新:chong2 xin1
重复:chong2 fu4
重庆:chong2 qing4
长大:zhang3 da4
长辈:zhang3 bei4
成长:cheng2 zhang3
校长:xiao4 zhang3
增长:zeng1 zhang3
队长:dui4 zhang3
长城:chang2 cheng2
长期:chang2 qi1
音乐:yin1 yue4
乐器:yue4 qi4
乐曲:yue4 qu3
快乐:kuai4 le4
觉得:jue2 de5
记得:ji4 de5
显得:xian3 de5
值得:zhi2 de5
获得:huo4 de2
取得:qu3 de2
得到:de2 dao4
得意:de2 yi4
干净:gan1 jing4
干燥:gan1 zao4
干部:gan4 bu4
干活:gan4 huo2
地方:di4 fang1
土地:tu3 di4
大地:da4 di4
地球:di4 qiu2
好地:hao3 de5
慢慢地:man4 man4 de5
为了:wei4 le5
因为:yin1 wei4
为什么:wei4 shen2 me5
认为:ren4 wei2
以为:yi3 wei2
成为:cheng2 wei2
作为:zuo4 wei2
只是:zhi3 shi4
只有:zhi3 you3
只要:zhi3 yao4
只能:zhi3 neng2
只好:zhi3 hao3
只见:zhi3 jian4
一只:yi4 zhi1
种子:zhong3 zi5
种类:zhong3 lei4
种植:zhong4 zhi2
耕种:geng1 zhong4
教师:jiao4 shi1
教育:jiao4 yu4
教室:jiao4 shi4
教书:jiao1 shu1
教给:jiao1 gei3
睡觉:shui4 jiao4
午觉:wu3 jiao4
感觉:gan3 jue2
觉悟:jue2 wu4
自觉:zi4 jue2
调查:diao4 cha2
调动:diao4 dong4
声调:sheng1 diao4
调整:tiao2 zheng3
调节:tiao2 jie2
空调:kong1 tiao2
便宜:pian2 yi5
方便:fang1 bian4
大便:da4 bian4
会计:kuai4 ji4
都市:du1 shi4
首都:shou3 du1
几乎:ji1 hu1
茶几:cha2 ji1
答应:da1 ying5
应该:ying1 gai1
应用:ying4 yong4
反应:fan3 ying4
相信:xiang1 xin4
相互:xiang1 hu4
照相:zhao4 xiang4
相片:xiang4 pian4
首相:shou3 xiang4
兴奋:xing1 fen4
兴起:xing1 qi3
高兴:gao1 xing4
兴趣:xing4 qu4
尽量:jin3 liang4
尽管:jin3 guan3
尽力:jin4 li4
孩子:hai2 zi5
妻子:qi1 zi5
儿子:er2 zi5
房子:fang2 zi5
样子:yang4 zi5
日子:ri4 zi5
桌子:zhuo1 zi5
椅子:yi3 zi5
鼻子:bi2 zi5
嗓子:sang3 zi5
村子:cun1 zi5
帽子:mao4 zi5
鞋子:xie2 zi5
袜子:wa4 zi5
裤子:ku4 zi5
裙子:qun2 zi5
杯子:bei1 zi5
瓶子:ping2 zi5
盒子:he2 zi5
箱子:xiang1 zi5
勺子:shao2 zi5
筷子:kuai4 zi5
刀子:dao1 zi5
叉子:cha1 zi5
狮子:shi1 zi5
猴子:hou2 zi5
兔子:tu4 zi5
蚊子:wen2 zi5
饺子:jiao3 zi5
包子:bao1 zi5
面子:mian4 zi5
脑子:nao3 zi5
肚子:du4 zi5
脖子:bo2 zi5
身子:shen1 zi5
个子:ge4 zi5
小伙子:xiao3 huo3 zi5
头发:tou2 fa5
出发:chu1 fa1
发现:fa1 xian4
发生:fa1 sheng1
发展:fa1 zhan3
理发:li3 fa4
东西:dong1 xi5
西瓜:xi1 gua1
喜欢:xi3 huan5
衣服:yi1 fu5
舒服:shu1 fu5
佩服:pei4 fu2
朋友:peng2 you5
知道:zhi1 dao4
明白:ming2 bai5
告诉:gao4 su5
什么:shen2 me5
怎么:zen3 me5
这么:zhe4 me5
那么:na4 me5
多么:duo1 me5
时候:shi2 hou5
时间:shi2 jian1
中间:zhong1 jian1
房间:fang2 jian1
间接:jian4 jie1
间隔:jian4 ge2
先生:xian1 sheng5
学生:xue2 sheng5
医生:yi1 sheng1
眼睛:yan3 jing5
耳朵:er3 duo5
月亮:yue4 liang5
漂亮:piao4 liang5
晚上:wan3 shang5
早上:zao3 shang5
身上:shen1 shang5
地上:di4 shang5
马上:ma3 shang4
上面:shang4 mian4
下面:xia4 mian4
里面:li3 mian4
外面:wai4 mian4
前面:qian2 mian4
后面:hou4 mian4
面条:mian4 tiao2
力气:li4 qi5
客气:ke4 qi5
天气:tian1 qi4
生气:sheng1 qi4
名字:ming2 zi5
记者:ji4 zhe3
或者:huo4 zhe3
作者:zuo4 zhe3
意思:yi4 si5
休息:xiu1 xi5
消息:xiao1 xi5
利息:li4 xi1
石头:shi2 tou5
木头:mu4 tou5
骨头:gu3 tou5
馒头:man2 tou5
枕头:zhen3 tou5
拳头:quan2 tou5
舌头:she2 tou5
礼物:li3 wu4
动物:dong4 wu4
事情:shi4 qing5
心情:xin1 qing2
热情:re4 qing2
爱情:ai4 qing2
咱们:zan2 men5
人们:ren2 men5
我们:wo3 men5
你们:ni3 men5
他们:ta1 men5
她们:ta1 men5
它们:ta1 men5
得了:de2 le5
算了:suan4 le5
罢了:ba4 le5
除了:chu2 le5
了解:liao3 jie3
了不起:liao3 bu4 qi3
大夫:dai4 fu5
丈夫:zhang4 fu5
功夫:gong1 fu5
工夫:gong1 fu5
弹琴:tan2 qin2
弹钢琴:tan2 gang1 qin2
子弹:zi3 dan4
炸弹:zha4 dan4
弹性:tan2 xing4
好像:hao3 xiang4
好处:hao3 chu4
爱好:ai4 hao4
好奇:hao4 qi2
好学:hao4 xue2
处理:chu3 li3
处于:chu3 yu2
相处:xiang1 chu3
到处:dao4 chu4
处处:chu4 chu4
办事处:ban4 shi4 chu4
数学:shu4 xue2
数字:shu4 zi4
数量:shu4 liang4
无数:wu2 shu4
数一数:shu3 yi4 shu3
倒是:dao4 shi4
倒下:dao3 xia4
摔倒:shuai1 dao3
打倒:da3 dao3
倒车:dao4 che1
倒退:dao4 tui4
假如:jia3 ru2
假装:jia3 zhuang1
真假:zhen1 jia3
放假:fang4 jia4
假期:jia4 qi1
请假:qing3 jia4
暑假:shu3 jia4
寒假:han2 jia4
差不多:cha4 bu5 duo1
差别:cha1 bie2
差距:cha1 ju4
出差:chu1 chai1
商贾:shang1 gu3
厦门:xia4 men2
大厦:da4 sha4
曲折:qu1 zhe2
降服:xiang2 fu2
盛饭:cheng2 fan4
茂盛:mao4 sheng4
盛大:sheng4 da4
angle:x
""".replace("angle:x\n", ""))

_phr("""
大家:da4 jia1
今天:jin1 tian1
明天:ming2 tian1
昨天:zuo2 tian1
看的:kan4 de5
想看:xiang3 kan4
看见:kan4 jian4
看书:kan4 shu1
看病:kan4 bing4
难看:nan2 kan4
看守:kan1 shou3
看护:kan1 hu4
降落:jiang4 luo4
下降:xia4 jiang4
投降:tou2 xiang2
曲子:qu3 zi5
歌曲:ge1 qu3
弯曲:wan1 qu1
曲线:qu1 xian4
血液:xue4 ye4
鲜血:xian1 xue4
流血:liu2 xue4
献血:xian4 xue4
宁可:ning4 ke3
宁愿:ning4 yuan4
安宁:an1 ning2
宁静:ning2 jing4
转身:zhuan3 shen1
转变:zhuan3 bian4
旋转:xuan2 zhuan4
转动:zhuan4 dong4
中奖:zhong4 jiang3
打中:da3 zhong4
中毒:zhong4 du2
中国:zhong1 guo2
中心:zhong1 xin1
省长:sheng3 zhang3
反省:fan3 xing3
省悟:xing3 wu4
节省:jie2 sheng3
塞车:sai1 che1
瓶塞:ping2 sai1
要塞:yao4 sai4
边塞:bian1 sai4
堵塞:du3 se4
闭塞:bi4 se4
传记:zhuan4 ji4
自传:zi4 zhuan4
传说:chuan2 shuo1
传统:chuan2 tong3
宣传:xuan1 chuan2
的确:di2 que4
目的:mu4 di4
打的:da3 di1
似的:shi4 de5
相似:xiang1 si4
类似:lei4 si4
朝阳:zhao1 yang2
朝气:zhao1 qi4
朝代:chao2 dai4
朝鲜:chao2 xian3
新鲜:xin1 xian1
鲜艳:xian1 yan4
鲜有:xian3 you3
空气:kong1 qi4
天空:tian1 kong1
空闲:kong4 xian2
空地:kong4 di4
填空:tian2 kong4
背包:bei1 bao1
背负:bei1 fu4
背后:bei4 hou4
后背:hou4 bei4
背景:bei4 jing3
背诵:bei4 song4
扫地:sao3 di4
打扫:da3 sao3
扫帚:sao4 zhou5
藏起来:cang2 qi3 lai2
躲藏:duo3 cang2
西藏:xi1 zang4
宝藏:bao3 zang4
单位:dan1 wei4
单独:dan1 du2
姓单:xing4 shan4
系统:xi4 tong3
关系:guan1 xi4
系鞋带:ji4 xie2 dai4
角色:jue2 se4
主角:zhu3 jue2
角度:jiao3 du4
三角:san1 jiao3
号角:hao4 jiao3
模型:mo2 xing2
模仿:mo2 fang3
模范:mo2 fan4
模样:mu2 yang4
模糊:mo2 hu5
切磋:qie1 cuo1
一切:yi2 qie4
亲切:qin1 qie4
密切:mi4 qie4
切实:qie4 shi2
结实:jie1 shi5
结果:jie2 guo3
结束:jie2 shu4
结婚:jie2 hun1
团结:tuan2 jie2
总结:zong3 jie2
几个:ji3 ge4
几天:ji3 tian1
几年:ji3 nian2
窗户:chuang1 hu5
棉花:mian2 hua5
力量:li4 liang5
商量:shang1 liang5
重量:zhong4 liang4
测量:ce4 liang2
量体温:liang2 ti3 wen1
打量:da3 liang5
思量:si1 liang5
能量:neng2 liang4
尽快:jin3 kuai4
尽早:jin3 zao3
耳机:er3 ji1
飞机:fei1 ji1
手机:shou3 ji1
机会:ji1 hui4
机器:ji1 qi4
伺候:ci4 hou5
伺机:si4 ji1
熟悉:shu2 xi1
成熟:cheng2 shu2
热闹:re4 nao5
困难:kun4 nan5
灾难:zai1 nan4
难民:nan4 min2
责难:ze2 nan4
磨难:mo2 nan4
""")

_phr("""
裂缝:lie4 feng4
缝隙:feng4 xi4
门缝:men2 feng4
牛仔:niu2 zai3
铺设:pu1 she4
铺垫:pu1 dian4
北斗:bei3 dou3
漏斗:lou4 dou3
烟斗:yan1 dou3
要塞:yao4 sai4
堵塞:du3 se4
阻塞:zu3 se4
闭塞:bi4 se4
地壳:di4 qiao4
复辟:fu4 bi4
轧钢:zha2 gang1
咯血:ka3 xie3
""")

# ---------------------------------------------------------------------------
# Collation-order propagation
# ---------------------------------------------------------------------------


def parse_collation():
    """Flat pinyin-ordered char list from the perl CLDR collation data."""
    text = open(PERL_DATA, encoding="utf-8").read()
    data = text.split("__DATA__")[1].split("__END__")[0]
    order = []
    for tok in data.split():
        if "-" in tok:  # FDD0-00XX letter-section markers
            continue
        try:
            order.append(chr(int(tok, 16)))
        except ValueError:
            pass
    return order


def propagate(order, curated):
    """Fill chars sandwiched between equal-reading curated anchors.

    Anchors are (position, reading) of the FIRST collation occurrence of
    each curated char.  A lone anchor whose reading differs from two equal
    neighbours is a polyphone listed here under a different reading — it is
    skipped (does not split the run, is not overwritten).
    """
    pos = {}
    for i, ch in enumerate(order):
        if ch in curated and ch not in pos:
            pos[ch] = i
    anchors = sorted((i, curated[ch]) for ch, i in pos.items())

    # drop discordant lone anchors (polyphone occurrences)
    cleaned = []
    for k, (i, r) in enumerate(anchors):
        prev_r = anchors[k - 1][1] if k > 0 else None
        next_r = anchors[k + 1][1] if k + 1 < len(anchors) else None
        if prev_r == next_r and prev_r is not None and r != prev_r:
            continue
        cleaned.append((i, r))

    out = {}
    for (i0, r0), (i1, r1) in zip(cleaned, cleaned[1:]):
        if r0 != r1:
            continue
        for j in range(i0 + 1, i1):
            ch = order[j]
            if ch not in curated and ch not in out:
                out[ch] = r0
    return out, len(cleaned), len(anchors)


def main():
    order = parse_collation()
    propagated, kept, total = propagate(order, CURATED)
    chars = dict(propagated)
    chars.update(CURATED)  # curated primaries always win
    data = {
        "comment": "char->TONE3 primary reading + phrase overrides; built "
                   "by scripts/build_pinyin_table.py (curated + CLDR "
                   "collation-order propagation). pypinyin conventions: "
                   "v for u-umlaut, neutral tone = 5.",
        "chars": dict(sorted(chars.items())),
        "phrases": dict(sorted(PHRASES.items())),
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=0, sort_keys=True)
    print(f"curated chars:    {len(CURATED)}")
    print(f"anchors kept:     {kept}/{total} "
          f"({total - kept} discordant polyphone occurrences skipped)")
    print(f"propagated chars: {len(propagated)}")
    print(f"total chars:      {len(chars)}")
    print(f"phrases:          {len(PHRASES)}")
    print(f"wrote {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
