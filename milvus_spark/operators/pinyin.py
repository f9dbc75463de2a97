"""Pinyin analyzer filter: Han characters → Latin romanization tokens.

Reference parity: the ``pinyin`` analyzer filter
(tests/python_client/milvus_client/test_milvus_client_pinyin_filter.py;
internal/util/analyzer/ filter zoo) emits, per Chinese token and per the
option flags:

  - ``keep_original``              → the token itself ("中文")
  - ``keep_full_pinyin``           → one syllable per char ("zhong", "wen")
  - ``keep_joined_full_pinyin``    → the syllables joined ("zhongwen")
  - ``keep_separate_first_letter`` → first letters joined ("zw")

Non-Chinese tokens always pass through unchanged.

The reference links a full pypinyin-style dataset; this container has no
such package, so an embedded dictionary of ~100 of the most common Han
characters (public-knowledge readings, one common reading each — no
tone marks, the form the filter emits) covers the mechanics; characters
outside the table fall back to themselves as their "syllable", which is
documented and deterministic on both engines. All column logic is pure
JVM (map literal + higher-order functions) — no Python row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ~100 most common Han characters with their most common reading
# (toneless pinyin — public knowledge)
PINYIN: dict[str, str] = {
    "中": "zhong", "文": "wen", "测": "ce", "试": "shi", "向": "xiang",
    "量": "liang", "数": "shu", "据": "ju", "库": "ku", "样": "yang",
    "本": "ben", "人": "ren", "大": "da", "小": "xiao", "国": "guo",
    "我": "wo", "你": "ni", "他": "ta", "她": "ta", "好": "hao",
    "学": "xue", "生": "sheng", "水": "shui", "火": "huo", "山": "shan",
    "天": "tian", "地": "di", "日": "ri", "月": "yue", "年": "nian",
    "时": "shi", "分": "fen", "上": "shang", "下": "xia", "左": "zuo",
    "右": "you", "前": "qian", "后": "hou", "东": "dong", "西": "xi",
    "南": "nan", "北": "bei", "京": "jing", "海": "hai", "河": "he",
    "江": "jiang", "湖": "hu", "花": "hua", "草": "cao", "木": "mu",
    "林": "lin", "森": "sen", "鸟": "niao", "鱼": "yu", "马": "ma",
    "牛": "niu", "羊": "yang", "狗": "gou", "猫": "mao", "车": "che",
    "门": "men", "窗": "chuang", "家": "jia", "房": "fang", "路": "lu",
    "桥": "qiao", "城": "cheng", "市": "shi", "县": "xian", "村": "cun",
    "电": "dian", "脑": "nao", "机": "ji", "器": "qi", "网": "wang",
    "络": "luo", "信": "xin", "息": "xi", "程": "cheng", "序": "xu",
    "软": "ruan", "件": "jian", "硬": "ying", "盘": "pan", "算": "suan",
    "法": "fa", "模": "mo", "型": "xing", "训": "xun", "练": "lian",
    "搜": "sou", "索": "suo", "查": "cha", "询": "xun", "排": "pai",
    "名": "ming", "字": "zi", "词": "ci", "句": "ju", "语": "yu",
    "言": "yan", "音": "yin", "声": "sheng", "图": "tu", "像": "xiang",
}


def _py_map() -> Column:
    pairs: list[Column] = []
    for ch, py in PINYIN.items():
        pairs.append(F.lit(ch))
        pairs.append(F.lit(py))
    return F.create_map(*pairs)


def pinyin_filter(
    toks: Column,
    keep_original: bool = True,
    keep_full_pinyin: bool = True,
    keep_joined_full_pinyin: bool = False,
    keep_separate_first_letter: bool = False,
) -> Column:
    """Apply the pinyin filter to a token array column (array<string>)."""
    m = _py_map()

    def per_token(t: Column) -> Column:
        chars = F.transform(
            F.sequence(F.lit(1), F.length(t)), lambda i: t.substr(i, F.lit(1))
        )
        raw = F.transform(chars, lambda c: F.element_at(m, c))
        is_cn = F.exists(raw, lambda s: s.isNotNull())
        sylls = F.zip_with(chars, raw, lambda c, s: F.coalesce(s, c))
        parts: list[Column] = []
        if keep_original:
            parts.append(F.array(t))
        if keep_full_pinyin:
            parts.append(sylls)
        if keep_joined_full_pinyin:
            parts.append(F.array(F.array_join(sylls, "")))
        if keep_separate_first_letter:
            parts.append(
                F.array(
                    F.array_join(
                        F.transform(sylls, lambda s: s.substr(1, 1)), ""
                    )
                )
            )
        out = F.concat(*parts) if parts else F.array().cast("array<string>")
        return F.when(is_cn, out).otherwise(F.array(t))

    return F.flatten(F.transform(toks, per_token))
