"""Pure-function detector tests — ports of the unit tests at
/root/reference/tests/test_warc_metadata_sidecar.py:55-106 (mime/puid,
charset, language, soft404, string payload) to our deterministic detectors."""

import json

from warc_metadata_sidecar_spark.functions.detectors import (
    _detect_one,
    detect_charset,
    detect_language,
    detect_soft404,
    serialize_payload,
    sniff_mime,
)

HTML = (
    "<!DOCTYPE html><html><head><title>UNT</title></head>"
    "<body><p>the quick brown fox jumps over the lazy dog and it is a fine "
    "day for crawling the web with the and of to in is that</p></body></html>"
)


def test_mime_and_puid_html():
    # cf. test_find_mime_and_puid (:55-58): {'fido','python-magic'} + fmt/471
    fido, magic, puid = sniff_mime(HTML, None)
    assert (fido, magic, puid) == ("text/html", "text/html", "fmt/471")


def test_mime_and_puid_gif():
    fido, magic, puid = sniff_mime(None, b"GIF89a\x01\x00")
    assert (fido, magic, puid) == ("image/gif", "image/gif", "fmt/4")


def test_charset_ascii():
    # cf. test_find_character_set (:61-64): ascii / 1.0
    assert detect_charset(HTML) == ("ascii", 1.0)


def test_charset_utf8():
    # chardet's UTF-8 prober: 0.7525 on thin evidence, 0.99 once >=8
    # multibyte sequences confirm (the golden page value,
    # reference tests :61-64 / warc.warc.meta.gz)
    assert detect_charset("café") == ("utf-8", 0.7525)
    assert detect_charset("café crème brûlée — déjà vu, naïveté, São Paulo") == ("utf-8", 0.99)


def test_charset_confidence_ladder():
    """VERDICT r2 #7: chardet-shaped non-1.0 confidences for BOM / UTF-16 /
    latin-1 cases, keyed on the artifacts the utf-8-replace ingest decode
    leaves behind."""
    # utf-8 BOM survives the decode as U+FEFF
    assert detect_charset("﻿hello") == ("UTF-8-SIG", 1.0)
    # utf-16le bytes decoded utf-8-replace: BOM -> 2 replacement chars,
    # ascii chars interleaved with NULs
    mangled_utf16 = b"\xff\xfeh\x00e\x00l\x00l\x00o\x00".decode("utf-8", "replace")
    assert detect_charset(mangled_utf16) == ("UTF-16", 1.0)
    # latin-1 accented LETTERS decoded utf-8-replace: sparse word-internal
    # replacements, no typographic-punctuation artifacts -> ISO-8859-1
    mangled_latin = "caf\xe9 cr\xe8me".encode("latin-1").decode("utf-8", "replace")
    assert detect_charset(mangled_latin) == ("ISO-8859-1", 0.73)


def test_charset_ladder_r4_rungs():
    """VERDICT r3 #6: the ISO-8859-1 vs Windows-1252 split and the
    SHIFT_JIS / EUC-JP rungs, keyed on utf-8-replace decode artifacts."""
    # cp1252 typographic punctuation: the 0x92 contraction apostrophe and
    # 0x93/0x94 quote pairs
    cp1252 = "don\u2019t say \u201cnever ever\u201d again".encode("cp1252").decode(
        "utf-8", "replace"
    )
    assert detect_charset(cp1252) == ("Windows-1252", 0.73)
    # accented-letter latin-1 text without punctuation artifacts
    latin1 = "na\xefve caf\xe9 cr\xe8me br\xfbl\xe9e".encode("latin-1").decode(
        "utf-8", "replace"
    )
    assert detect_charset(latin1) == ("ISO-8859-1", 0.73)
    # Shift-JIS double-byte kanji: second bytes are printable ascii ->
    # dense replacement text with many \ufffdX pairs
    sjis = ("\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8" * 4).encode(
        "shift_jis"
    ).decode("utf-8", "replace")
    assert detect_charset(sjis) == ("SHIFT_JIS", 0.99)
    # EUC-JP: both bytes >= 0xA1 -> pure replacement runs. The sample
    # carries KANA (any real Japanese prose does) \u2014 r5's ja-vs-zh split
    # keys on the kana-adjacency fingerprint, and a kanji-ONLY snippet
    # legitimately reads as Chinese (documented ladder limit).
    euc = (
        "\u65e5\u672c\u8a9e\u306e\u6587\u7ae0\u3092\u3082\u3063\u3068"
        "\u8aad\u307f\u305f\u3044\u3068\u601d\u3046\u3002" * 2
    ).encode("euc-jp").decode("utf-8", "replace")
    assert detect_charset(euc) == ("EUC-JP", 0.99)


def test_extended_signature_table():
    """A dozen more PUID signatures (VERDICT r2 #7) incl. RIFF sub-sniffing."""
    cases = [
        (b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/x-wav", "fmt/6"),
        (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp", "fmt/566"),
        (b"RIFF\x00\x00\x00\x00AVI LIST", "video/x-msvideo", "fmt/5"),
        (b"BM\x8a\x00", "image/bmp", "fmt/116"),
        (b"II*\x00\x10", "image/tiff", "fmt/353"),
        (b"MM\x00*\x00", "image/tiff", "fmt/353"),
        (b"\x00\x00\x01\x00\x02\x00", "image/vnd.microsoft.icon", "x-fmt/418"),
        (b"fLaC\x00\x00", "audio/flac", "fmt/279"),
        (b"OggS\x00\x02", "audio/ogg", "fmt/203"),
        (b"\x1aE\xdf\xa3\x01matroska", "video/x-matroska", "fmt/569"),
        (b"\x1aE\xdf\xa3\x01B\x82\x88webm", "video/webm", "fmt/573"),
        (b"7z\xbc\xaf\x27\x1c\x00", "application/x-7z-compressed", "fmt/258"),
        (b"Rar!\x1a\x07\x00", "application/vnd.rar", "x-fmt/264"),
        (b"BZh91AY", "application/x-bzip2", "x-fmt/268"),
        (b"SQLite format 3\x00", "application/vnd.sqlite3", "fmt/729"),
        (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "application/x-ole-storage", "fmt/111"),
        (b"wOFF\x00\x01", "font/woff", "fmt/1044"),
        (b"\xff\xfb\x90\x44", "audio/mpeg", "fmt/134"),
    ]
    for head, mime, puid in cases:
        fido, magic, got_puid = sniff_mime(None, head)
        assert (fido, magic, got_puid) == (mime, mime, puid), head


def test_charset_empty():
    enc, _ = detect_charset("")
    assert enc is None


def test_language_english():
    # cf. test_find_language (:67-71): ENGLISH identified, cld2-shaped dict
    res = detect_language(HTML)
    assert res is not None
    assert res["languages"][0]["name"] == "ENGLISH"
    assert res["languages"][0]["code"] == "en"
    assert res["reliable"] is True
    assert res["text-bytes"] > 0


def test_language_unknown_is_none():
    # cf. test_find_language_with_no_languages (:74-77)
    assert detect_language("zzz qqq xxx 123 456") is None
    assert detect_language("") is None


def test_soft404_range_and_signal():
    # cf. test_determine_soft404 (:80-85): returns a probability
    low = detect_soft404(HTML)
    high = detect_soft404(
        "<html><head><title>404 Not Found</title></head>"
        "<body>Sorry, the page you requested was not found. Error 404.</body></html>"
    )
    assert 0.0 <= low < high < 1.0


def test_serialize_payload_golden_shape():
    # cf. test_create_string_payload (:94-106): five 'Title: value' lines,
    # json.dumps formatting, '\n' joined, absent fields omitted
    lang = {
        "reliable": True,
        "text-bytes": 2048,
        "languages": [{"name": "ENGLISH", "code": "en", "text-covered": 90, "score": 2048.0}],
    }
    payload = serialize_payload(
        "text/html", "text/html", "fmt/471", "ascii", 1.0, lang, 0.25
    )
    lines = payload.split("\n")
    assert lines[0] == (
        'Identified-Payload-Type: {"fido": "text/html", "python-magic": "text/html"}'
    )
    assert lines[1] == "Preservation-Identifier: fmt/471"
    assert lines[2] == 'Charset-Detected: {"encoding": "ascii", "confidence": 1.0}'
    assert json.loads(lines[3].split(": ", 1)[1])["languages"][0]["code"] == "en"
    assert lines[4] == "Soft-404-Detected: 0.25"


def test_serialize_payload_absent_fields():
    assert serialize_payload(None, None, None, None, 0.0, None, None) == ""
    # soft404 == 0.0 is still emitted (reference: `soft404 is not None`, :162)
    assert serialize_payload(None, None, None, None, 0.0, None, 0.0).endswith("0.0")
    # charset omitted when encoding None even with confidence present (:158)
    assert "Charset" not in serialize_payload("text/plain", None, None, None, 0.73, None, None)


def test_detect_one_gating():
    # charset/lang only for text mimes (F6, :255); soft404 only 200+html (F7)
    gif = _detect_one(None, b"GIF89a\x01", "200")
    assert gif["mime_fido"] == "image/gif"
    assert gif["charset_encoding"] is None
    assert gif["languages_json"] is None
    assert gif["soft404"] is None

    html_404 = _detect_one(HTML, None, "404")
    assert html_404["charset_encoding"] == "ascii"
    assert html_404["soft404"] is None  # not status 200

    html_200 = _detect_one(HTML, None, "200")
    assert html_200["soft404"] is not None


def test_soft404_threshold_calibration():
    """VERDICT r3 #6: calibration against the soft404 model's published 0.5
    decision threshold — a 404-titled page or a phrase-laden short error
    page crosses it; ordinary content (even mentioning 'not found' once in
    a long article) stays well below; scores are never exactly 0 (the
    logistic model isn't, and the CDXJ merge truthy-gates the field)."""
    title_404 = (
        "<html><head><title>404 Not Found</title></head>"
        "<body>Sorry, the page you requested was not found.</body></html>"
    )
    assert detect_soft404(title_404) > 0.5
    short_error = "Error 404. The page cannot be found. This page is no longer available."
    assert detect_soft404(short_error) > 0.5
    normal = "<html><body>" + ("All about crawling the web. " * 300) + "</body></html>"
    assert detect_soft404(normal) < 0.2
    long_article = (
        "<html><body>" + ("Discussion of HTTP errors. " * 300)
        + "A missing page returns not found." + "</body></html>"
    )
    assert detect_soft404(long_article) < 0.5
    assert detect_soft404(normal) > 0.0  # truthy floor


def test_language_r4_coverage():
    """r4 tranche: script-keyed Japanese/Korean (kana/hangul chars are the
    markers — Japanese kanji alone would otherwise misread as Chinese) and
    token-profile Russian/Dutch/Swedish."""
    cases = {
        "ja": "日本語のテキストです。これはテストのための文章で、とても簡単な内容です。",
        "ko": "한국어 텍스트입니다 이것은 테스트를 위한 문장이며 매우 간단한 내용입니다",
        "ru": "и в не на я что с по это он как но его к а мы из у за работа",
        "nl": "de kat zat op het dak en ik zag dat die niet van de regen hield",
        "sv": "och det är en dag som inte han hon för med av den till om på",
        "zh": "这是一个中文的测试文本 我们的内容是为了测试语言检测的 他是一个很大的工程",
    }
    for want, text in cases.items():
        r = detect_language(text)
        assert r and r["languages"][0]["code"] == want, (want, r)
    names = {detect_language(t)["languages"][0]["name"] for t in cases.values()}
    assert {"Japanese", "Korean", "RUSSIAN", "DUTCH", "SWEDISH", "Chinese"} == names


def test_language_halfwidth_katakana():
    """Half-width katakana (Shift_JIS-era pages, common in web archives)
    is Japanese."""
    r = detect_language("ﾃｽﾄﾃﾞｰﾀ ﾍﾟｰｼﾞ ｶﾞｲﾄﾞ ｻﾝﾌﾟﾙ ｺﾝﾃﾝﾂ")
    assert r and r["languages"][0]["code"] == "ja"


def test_charset_ladder_r5_rungs():
    """VERDICT r4 #5: Cyrillic, Big5 and GB18030 rungs. Every fixture is
    built by encode(legacy) -> decode(utf-8, replace) — exactly the ingest
    mangle the ladder sees in production."""
    ru = "Российская Федерация расположена в Восточной Европе и Северной Азии."
    # single-byte Cyrillic keeps its ASCII word spacing -> the Cyrillic
    # rung; KOI8-R is REPORTED AS windows-1251 BY DESIGN: both alphabets
    # map to the identical replacement profile after the decode (asserted
    # right here — the two mangled strings have the same artifact shape),
    # so the raw-byte frequency split chardet makes is not observable
    # post-ingest; 1251 is the dominant-share answer and the production
    # chardet seam restores the true split.
    for codec in ("windows-1251", "koi8-r"):
        mangled = ru.encode(codec, errors="ignore").decode("utf-8", "replace")
        assert detect_charset(mangled) == ("windows-1251", 0.73), codec
    # Big5: ascii-second-byte pairs WITHOUT the kana-adjacency fingerprint
    for zh_t in (
        "臺灣位於東亞，首都為臺北。夜市文化聞名世界。",
        "繁體中文在臺灣、香港與澳門廣泛使用，歷史文化悠久。",
        "歡迎光臨本網站，請按下面的連結繼續瀏覽。",
    ):
        mangled = zh_t.encode("big5", errors="ignore").decode("utf-8", "replace")
        assert detect_charset(mangled) == ("Big5", 0.99), zh_t
    # GB18030/GBK: pair-free dense without the fingerprint
    for zh_s, codec in (
        ("中国是位于东亚的国家，首都是北京。人口约十四亿。", "gb18030"),
        ("经济发展迅速，科技水平不断提高，人民生活更加美好。", "gbk"),
        ("欢迎访问本网站，请点击下面的链接继续浏览。", "gb18030"),
    ):
        mangled = zh_s.encode(codec, errors="ignore").decode("utf-8", "replace")
        assert detect_charset(mangled) == ("GB18030", 0.99), zh_s
    # the Japanese sides of both splits still classify ja via the
    # kana-adjacency fingerprint (hiragana-bearing prose)
    sjis = "ご利用ありがとうございます。次のページへ進んでください。".encode(
        "shift_jis"
    ).decode("utf-8", "replace")
    assert detect_charset(sjis) == ("SHIFT_JIS", 0.99)
    euc = "今日もまた雨が降っている。もうすぐ梅雨が明けるだろう。".encode(
        "euc-jp"
    ).decode("utf-8", "replace")
    assert detect_charset(euc) == ("EUC-JP", 0.99)
    # the SJIS-only low-6-bit band (leads 0x81-0x9F as continuations of
    # accidental valid decodes — impossible for Big5/GB, whose
    # continuation bytes are all >= 0xA1): kanji/katakana-mixed SJIS
    # prose with sparse hiragana classifies correctly through it
    sjis_mixed = "日本は東アジアに位置する島国である。首都は東京で、人口はおよそ一億二千万人。".encode(
        "shift_jis"
    ).decode("utf-8", "replace")
    assert detect_charset(sjis_mixed) == ("SHIFT_JIS", 0.99)
    # review fix: SPACED CJK content (nav menus, title rows) must stay on
    # the CJK rungs, not fall into the Cyrillic space-interleave rung —
    # Cyrillic additionally requires a near-zero accidental-decode rate
    for text, codec, want in (
        ("中国 北京 上海 欢迎光临 本网站 新闻 体育 财经 科技 汽车", "gbk", "GB18030"),
        ("首頁 新聞 軍事 國際 社會 評論 圖片 影音 更多內容", "big5", "Big5"),
    ):
        mangled = text.encode(codec, errors="ignore").decode("utf-8", "replace")
        assert detect_charset(mangled) == (want, 0.99), (codec, text)


def test_extended_signature_table_r5():
    """r5 signature tranche: tar-at-257, PSD, PE, ELF, Java class, TTF,
    FLV, ASF, AMR, RPM; EPUB detected through a NON-adjacent marker pair
    (ADVICE r4: a local header extra field breaks the contiguous
    'mimetypeapplication/epub+zip' form and previously fell through to the
    JAR rule); SVG text sniff."""
    from warc_metadata_sidecar_spark.functions.detectors import sniff_mime

    tar_head = b"\x00" * 257 + b"ustar\x00" + b"\x00" * 200
    assert sniff_mime(None, tar_head) == (
        "application/x-tar", "application/x-tar", "x-fmt/265"
    )
    cases = [
        (b"8BPS" + b"\x00" * 20, "image/vnd.adobe.photoshop", "x-fmt/92"),
        (b"MZ\x90\x00" + b"\x00" * 20, "application/x-dosexec", "fmt/899"),
        (b"\x7fELF\x02\x01" + b"\x00" * 20, "application/x-executable", "fmt/688"),
        (b"\xca\xfe\xba\xbe\x00\x00\x00\x34", "application/java-vm", "x-fmt/415"),
        (b"\x00\x01\x00\x00\x00\x0c\x00\x80", "font/ttf", "x-fmt/453"),
        (b"FLV\x01\x05", "video/x-flv", "x-fmt/382"),
        (b"\x30\x26\xb2\x75\x8e\x66\xcf\x11\xa6\xd9", "video/x-ms-asf", "fmt/132"),
        (b"#!AMR\n\x3c", "audio/amr", "fmt/663"),
        (b"\xed\xab\xee\xdb\x03\x00", "application/x-rpm", "fmt/795"),
    ]
    for head, mime, puid in cases:
        assert sniff_mime(None, head) == (mime, mime, puid), head[:8]

    # EPUB with a 12-byte extra field between the 'mimetype' member name and
    # its 'application/epub+zip' payload — adjacency broken, pair still found
    epub_extra = (
        b"PK\x03\x04\x14\x00\x00\x00\x00\x00" + b"\x00" * 16
        + b"\x08\x00\x0c\x00" + b"mimetype" + b"\x01\x02" * 6
        + b"application/epub+zip" + b"META-INF/container.xml" + b"\x00" * 64
    )
    assert sniff_mime(None, epub_extra) == (
        "application/epub+zip", "application/epub+zip", "fmt/483"
    )
    # review fix: a LARGE extra field (zip allows 64 KiB) pushes the
    # marker past any small prefix window — the pair is searched over the
    # whole 1 KiB head
    epub_big_extra = (
        b"PK\x03\x04\x14\x00\x00\x00\x00\x00" + b"\x00" * 16
        + b"\x08\x00\x2c\x01" + b"mimetype" + b"\x01\x02" * 150
        + b"application/epub+zip" + b"META-INF/container.xml" + b"\x00" * 64
    )
    assert sniff_mime(None, epub_big_extra) == (
        "application/epub+zip", "application/epub+zip", "fmt/483"
    )
    # the contiguous classic form still matches
    epub_plain = b"PK\x03\x04" + b"\x00" * 26 + b"mimetypeapplication/epub+zip" + b"\x00" * 32
    assert sniff_mime(None, epub_plain) == (
        "application/epub+zip", "application/epub+zip", "fmt/483"
    )
    # a real JAR (no epub markers) still reads as JAR
    jar = b"PK\x03\x04" + b"\x00" * 26 + b"META-INF/MANIFEST.MF" + b"\x00" * 32
    assert sniff_mime(None, jar) == (
        "application/java-archive", "application/java-archive", "x-fmt/412"
    )
    # SVG text sniff (after HTML, before XML): both bare and xml-decl forms
    assert sniff_mime('<svg xmlns="http://www.w3.org/2000/svg"><rect/></svg>', None)[2] == "fmt/91"
    assert sniff_mime('<?xml version="1.0"?>\n<svg width="5"></svg>', None)[2] == "fmt/91"
    # an HTML page EMBEDDING svg is still html
    assert sniff_mime("<!doctype html><html><body><svg></svg></body></html>", None)[2] == "fmt/471"


def test_language_r5_scripts_and_polish():
    """r5 language tranche: Arabic/Hebrew/Greek/Hindi/Thai via the
    script-keyed char path, Polish via a distinctive token profile."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("ar", "ARABIC", "اللغة العربية هي أكثر اللغات السامية تحدثا وانتشارا في العالم"),
        ("he", "HEBREW", "השפה העברית היא שפה שמית המדוברת בישראל על ידי מיליוני אנשים"),
        ("el", "GREEK", "η ελληνική γλώσσα είναι μία από τις αρχαιότερες γλώσσες του κόσμου"),
        ("hi", "HINDI", "हिन्दी भारत की आधिकारिक भाषाओं में से एक है और करोड़ों लोग इसे बोलते हैं"),
        ("th", "THAI", "ภาษาไทยเป็นภาษาราชการของประเทศไทยและมีผู้พูดหลายสิบล้านคน"),
        ("pl", "POLISH", "język polski jest językiem zachodniosłowiańskim którym można się "
                          "porozumieć w całej polsce ponieważ nie jest on już tylko mową ludową "
                          "i został przez wieki ukształtowany oraz jest bardzo bogaty"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])


def test_language_english_with_stray_greek_math():
    """A stray math symbol must not flip an English page to Greek: the
    char-level path only counts script chars, and English marker hits
    dominate."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    text = (
        "the value of α is small and the value of β is large in this model "
        "and we show that it is the best fit for the data in the table"
    )
    got = detect_language(text)
    assert got["languages"][0]["code"] == "en"


def test_language_r5b_token_profiles():
    """Second r5 tranche: Turkish/Finnish/Czech/Ukrainian token profiles;
    Ukrainian must win over Russian on Ukrainian text (і/ї/є-bearing
    function words) and Russian text must stay Russian."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("tr", "TURKISH", "türkçe bir dildir ve bu dil dünyada çok konuşulur ancak "
                           "yazımı için latin alfabesi ile birlikte kullanılır ve daha "
                           "sonra olarak gelişmiştir"),
        ("fi", "FINNISH", "suomi on kieli jota puhutaan suomessa ja se ei ole helppo "
                           "mutta hän oppii sen myös jos niin haluaa kuin muutkin"),
        ("cs", "CZECH", "čeština je západoslovanský jazyk kterým se mluví v česku ale "
                         "jeho gramatika je složitá a jsou na ni pro cizince podle "
                         "všeho však těžké příklady které již znáte"),
        ("uk", "UKRAINIAN", "українська мова і її історія але вона вже давно відома як "
                             "мова що має багату літературу або пісенну традицію від "
                             "давнини і його вплив був значним"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])
    # Russian stays Russian despite sharing Cyrillic script with Ukrainian
    ru = ("русский язык является одним из крупнейших языков мира и на нём "
          "говорят миллионы людей но его грамматика не проста а мы изучаем "
          "это с интересом как и он")
    got = detect_language(ru)
    assert got["languages"][0]["code"] == "ru", got["languages"][:2]


def test_tar_gnu_format_detected():
    """ADVICE r5: GNU old-format tar writes magic+version 'ustar  \\x00' —
    the old 6-byte slice could never match the 7-byte literal, so real GNU
    archives read as octet-stream. Built with the stdlib tarfile writer
    (an independent producer), all three families must sniff as tar."""
    import io
    import tarfile

    from warc_metadata_sidecar_spark.functions.detectors import sniff_mime

    for fmt in (tarfile.GNU_FORMAT, tarfile.USTAR_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            data = b"hello tar"
            info = tarfile.TarInfo("member.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        head = buf.getvalue()[:1024]
        assert sniff_mime(None, head) == (
            "application/x-tar", "application/x-tar", "x-fmt/265"
        ), fmt
    # an offset-257 region that is NOT a tar magic stays undetected
    not_tar = b"\x00" * 257 + b"ustarXX" + b"\x00" * 200
    assert sniff_mime(None, not_tar)[1] == "application/octet-stream"


def test_charset_bytes_ladder():
    """VERDICT r5 #2: the raw-bytes charset ladder decides the cases that
    are provably undecidable post-decode — KOI8-R vs windows-1251 (case-band
    statistic), Big5 vs GB18030 (variant-marker counts under each decode),
    katakana-only Shift-JIS — plus the BOM/ascii/utf-8 rungs on bytes."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset_bytes

    ru = "Российская Федерация расположена в Восточной Европе и Северной Азии."
    zh_s = "中国是位于东亚的国家，首都是北京。人口约十四亿。经济发展迅速。"
    zh_t = "臺灣位於東亞，首都為臺北。夜市文化聞名世界。繁體中文廣泛使用。"
    ja = "日本語のテキストです。これはテストのための文章で、とても簡単な内容です。"
    ja_kata = "カタカナ・フラグメント・サンプル・テキスト"
    ko = "한국어 텍스트입니다 이것은 테스트를 위한 문장이며 매우 간단한 내용입니다"
    cases = [
        # the artifact-undecidable Cyrillic split, now decidable
        (ru.encode("windows-1251"), "windows-1251", 0.73),
        (ru.encode("koi8-r"), "KOI8-R", 0.73),
        # Big5 vs GB18030 on bytes (GB pairs are valid-but-garbage Big5
        # and vice versa: the marker count under the RIGHT decode wins)
        (zh_s.encode("gb18030"), "GB18030", 0.99),
        (zh_s.encode("gbk"), "GB18030", 0.99),
        (zh_t.encode("big5"), "Big5", 0.99),
        # ja / ko
        (ja.encode("shift_jis"), "SHIFT_JIS", 0.99),
        (ja.encode("euc_jp"), "EUC-JP", 0.99),
        (ko.encode("euc_kr"), "EUC-KR", 0.99),
        # katakana-only SJIS — the documented artifact-ladder limit,
        # closed at the byte level (kana decode directly)
        (ja_kata.encode("shift_jis"), "SHIFT_JIS", 0.99),
        # kanji-only SJIS (no kana): competing CJK decodes fail/garbage
        ("日本国東京都新宿区西新宿二丁目".encode("shift_jis"), "SHIFT_JIS", 0.99),
        # single-byte western + BOM/ascii/utf-8 rungs
        ("naïve café crème brûlée déjà vu".encode("latin-1"), "ISO-8859-1", 0.73),
        ("don’t say “never” l’été".encode("cp1252"), "Windows-1252", 0.73),
        (b"plain ascii text here", "ascii", 1.0),
        (ja.encode("utf-8"), "utf-8", 0.99),
        ("héllo there everyone".encode("utf-8"), "utf-8", 0.7525),
        ("plain".encode("utf-8-sig"), "UTF-8-SIG", 1.0),
        ("plain text".encode("utf-16"), "UTF-16", 1.0),
        (b"", None, 0.0),
    ]
    for raw, want_enc, want_conf in cases:
        assert detect_charset_bytes(raw) == (want_enc, want_conf), raw[:24]
    # markup-heavy pages keep their rung (high-byte density diluted by
    # ascii tags must not derail the run-adjacency / marker statistics)
    ru_html = ("<html><head><title>Новости</title></head><body><p>" + ru
               + "</p></body></html>")
    assert detect_charset_bytes(ru_html.encode("koi8-r")) == ("KOI8-R", 0.73)
    assert detect_charset_bytes(ru_html.encode("windows-1251")) == ("windows-1251", 0.73)
    zh_html = "<html><body>" + zh_s + "</body></html>"
    assert detect_charset_bytes(zh_html.encode("gb18030")) == ("GB18030", 0.99)
    # an 8 KiB head cut MID-CHARACTER must not derail detection
    assert detect_charset_bytes(zh_s.encode("gb18030")[:31]) == ("GB18030", 0.99)
    assert detect_charset_bytes(ja.encode("shift_jis")[:33]) == ("SHIFT_JIS", 0.99)
    assert detect_charset_bytes(ja.encode("utf-8")[:20]) == ("utf-8", 0.99)


def test_detect_one_prefers_charset_head_bytes():
    """The seam: with a raw charset_head the detector reports the
    byte-level result; without it, the artifact ladder (which cannot split
    KOI8-R from windows-1251) answers."""
    ru_html = ("<html><body>Российская Федерация расположена в Восточной "
               "Европе и Северной Азии.</body></html>")
    raw = ru_html.encode("koi8-r")
    text = raw.decode("utf-8", "replace")
    with_head = _detect_one(text, None, "200", charset_head=raw)
    assert with_head["charset_encoding"] == "KOI8-R"
    without = _detect_one(text, None, "200")
    assert without["charset_encoding"] == "windows-1251"  # documented artifact limit
    # gating unchanged: a binary payload never computes charset even with a head
    gif = _detect_one(None, b"GIF89a\x01", "200", charset_head=b"\xff\xfe junk")
    assert gif["charset_encoding"] is None


def test_charset_katakana_artifact_rung():
    """r6 (VERDICT r5 #5): katakana-only SJIS fragments — single 0x83 lead
    (always replaced) + mostly-ascii trail gives pairs >= half the
    replacements with ZERO accidental valid decodes; Big5 hanzi stays Big5
    (its 0xA1+ trail half doubles replacements, pair ratio < 0.5)."""
    for kata in ("カタカナ・フラグメント", "インターネット", "アクセスカウンタ", "ダウンロード"):
        m = kata.encode("shift_jis").decode("utf-8", "replace")
        assert detect_charset(m) == ("SHIFT_JIS", 0.99), kata
    # Big5 prose (fragments long enough for the dense rung, >= 8
    # replacements) keeps its rung
    for zh in (
        "臺灣位於東亞首都為臺北",
        "夜市文化聞名世界歡迎光臨",
        "歡迎光臨本網站請按下面的連結",
        "繁體中文在臺灣香港與澳門廣泛使用",
    ):
        m = zh.encode("big5", errors="ignore").decode("utf-8", "replace")
        assert detect_charset(m) == ("Big5", 0.99), zh


def test_signature_tranche_r6():
    """r6 signatures: WARC (well-known PRONOM id), parquet/avro/wasm/pcap/
    pcapng/lz4/cab/cpio/squashfs/djvu (mime certain, puid honestly None —
    the payload omits Preservation-Identifier exactly as the reference does
    when fido yields nothing), ar vs deb sub-sniff, DICOM at offset 128."""
    from warc_metadata_sidecar_spark.functions.detectors import serialize_payload

    cases = [
        (b"WARC/1.0\r\nWARC-Type: response", "application/warc", "fmt/289"),
        (b"PAR1\x15\x04", "application/vnd.apache.parquet", None),
        (b"Obj\x01\x04", "application/avro", None),
        (b"\x00asm\x01\x00\x00\x00", "application/wasm", None),
        (b"\xd4\xc3\xb2\xa1\x02\x00", "application/vnd.tcpdump.pcap", None),
        (b"\x04\x22\x4d\x18\x64\x40", "application/x-lz4", None),
        (b"MSCF\x00\x00\x00\x00", "application/vnd.ms-cab-compressed", None),
        (b"070701000003E8000081A4", "application/x-cpio", None),
        (b"hsqs\x00\x01", "application/x-squashfs", None),
        (b"AT&TFORMDJVU", "image/vnd.djvu", None),
        (b"!<arch>\ndebian-binary   123", "application/vnd.debian.binary-package", None),
        (b"!<arch>\nfile1.o/        123", "application/x-archive", None),
        (b"\x00" * 128 + b"DICM\x02\x00", "application/dicom", None),
    ]
    for head, mime, puid in cases:
        got = sniff_mime(None, head)
        assert got == (mime, mime, puid), (head[:12], got)
    # a None puid serializes with NO Preservation-Identifier line
    payload = serialize_payload("application/wasm", "application/wasm", None, None, 0.0, None, None)
    assert "Preservation-Identifier" not in payload
    assert "application/wasm" in payload


def test_language_r6_token_profiles():
    """r6 languages: Romanian/Hungarian/Vietnamese/Croatian; Czech text
    must stay Czech despite Croatian sharing Slavic vocabulary."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("ro", "ROMANIAN", "limba română este o limbă romanică și este vorbită de "
                            "milioane de oameni dar pentru care din istorie au fost "
                            "multe schimbări până acum fără acest lucru"),
        ("hu", "HUNGARIAN", "a magyar nyelv és a magyar emberek hogy nem csak egy "
                             "országban élnek már régóta mint még sok más nép vagy "
                             "nemzet azonban szerint minden nagyon fontos"),
        ("vi", "VIETNAMESE", "tiếng việt là ngôn ngữ của người việt nam và được sử "
                              "dụng trong những văn bản một cách chính thức cho với "
                              "này đã có không ít thay đổi"),
        ("hr", "CROATIAN", "hrvatski jezik što ili koji se govori također nakon "
                            "dugog razdoblja zbog povijesti između država prema "
                            "novim pravilima tijekom godina gdje svoje mjesto bio"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])
    cz = ("čeština je západoslovanský jazyk kterým se mluví v česku ale jeho "
          "gramatika je složitá a jsou pro cizince podle všeho však těžké "
          "příklady které již znáte")
    assert detect_language(cz)["languages"][0]["code"] == "cs"


def test_charset_euc_kr_artifact_limit_and_byte_resolution():
    """r6 documented limit: EUC-KR Korean reads as GB18030 through the
    decode-ARTIFACT ladder (its accidental valid decodes start at trail
    bytes and span the full two-byte band — no hangul fingerprint
    survives); the raw-bytes path classifies it correctly, which is why
    charset_head is authoritative."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset_bytes

    ko = "대한민국은 동아시아의 한반도에 위치한 나라이다 수도는 서울특별시이다"
    raw = ko.encode("euc_kr")
    assert detect_charset(raw.decode("utf-8", "replace")) == ("GB18030", 0.99)
    assert detect_charset_bytes(raw) == ("EUC-KR", 0.99)


def test_language_r6b_token_profiles():
    """r6b languages: Norwegian (divergent-orthography markers split it
    from Danish), Indonesian, Bulgarian (split from Russian), Slovak
    (split from Czech) — and the neighbors must not flip."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("no", "NORWEGIAN", "norsk er et språk som ble brukt i norge etter mange år "
                             "og gjennom historien har det blitt mye endring mellom "
                             "dialektene noen ganger må en se opp og ut mot havet for "
                             "å forstå hvordan det fikk sin form nå"),
        ("id", "INDONESIAN", "bahasa indonesia adalah bahasa resmi yang digunakan di "
                              "seluruh negara dan dengan itu untuk komunikasi dari "
                              "berbagai suku ini juga akan telah menjadi bahasa "
                              "persatuan yang tidak tergantikan pada masa depan"),
        ("bg", "BULGARIAN", "българският език е южнославянски език като той се "
                             "говори от милиони хора които са в страната и това ще "
                             "продължи през годините след което между другото би "
                             "останал официален върху цялата територия беше и ще бъде"),
        ("sk", "SLOVAK", "slovenčina je západoslovanský jazyk ako aj čeština bol "
                          "vždy blízky sused ktoré slová sú podobné tiež podľa "
                          "gramatiky medzi nimi alebo keď niekto hovorí pretože "
                          "rozdiely môže počuť každý"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])
    # neighbors stay put: Danish (the og/i/det/til core Norwegian avoids),
    # Russian (и/в/не core Bulgarian avoids), Czech (je/se/na core Slovak
    # avoids)
    da = ("og i det at en den til er som af med for ikke han hun jeg var "
          "en dansk tekst om historien")
    assert detect_language(da)["languages"][0]["code"] == "da"
    ru = ("русский язык и культура в россии не только на словах я думаю что "
          "с ним по миру это он как все знают но его вклад к литературе а "
          "мы из него у всех за века")
    assert detect_language(ru)["languages"][0]["code"] == "ru"
    cz = ("čeština je západoslovanský jazyk kterým se mluví v česku ale jeho "
          "gramatika je složitá a jsou pro cizince podle všeho však těžké "
          "příklady které již znáte")
    assert detect_language(cz)["languages"][0]["code"] == "cs"


def test_language_r6c_script_tranche():
    """r6c: fourteen script-keyed languages — nine Brahmic blocks,
    Georgian/Armenian/Amharic, and the space-less Khmer/Lao/Myanmar
    (whole phrases tokenize as one run; first-char script classifies,
    same as Thai). Each script maps 1:1 to its cld2 language name."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("bn", "BENGALI", "আমি বাংলায় গান গাই আমি বাংলার গান গাই"),
        ("pa", "PUNJABI", "ਮੈਂ ਪੰਜਾਬੀ ਵਿੱਚ ਲਿਖਦਾ ਹਾਂ ਇਹ ਇੱਕ ਟੈਸਟ ਹੈ"),
        ("gu", "GUJARATI", "હું ગુજરાતીમાં લખું છું આ એક પરીક્ષણ છે"),
        ("ta", "TAMIL", "நான் தமிழில் எழுதுகிறேன் இது ஒரு சோதனை"),
        ("te", "TELUGU", "నేను తెలుగులో రాస్తున్నాను ఇది ఒక పరీక్ష"),
        ("kn", "KANNADA", "ನಾನು ಕನ್ನಡದಲ್ಲಿ ಬರೆಯುತ್ತೇನೆ ಇದು ಒಂದು ಪರೀಕ್ಷೆ"),
        ("ml", "MALAYALAM", "ഞാൻ മലയാളത്തിൽ എഴുതുന്നു ഇതൊരു പരീക്ഷണമാണ്"),
        ("si", "SINHALESE", "මම සිංහලෙන් ලියමි මෙය පරීක්ෂණයකි"),
        ("ka", "GEORGIAN", "მე ვწერ ქართულად ეს არის ტესტი"),
        ("hy", "ARMENIAN", "Ես գրում եմ հայերեն սա թեստ է"),
        ("am", "AMHARIC", "እኔ በአማርኛ እጽፋለሁ ይህ ሙከራ ነው"),
        ("km", "KHMER", "ខ្ញុំសរសេរជាភាសាខ្មែរ នេះជាការធ្វើតេស្ត"),
        ("lo", "LAOTHIAN", "ຂ້ອຍຂຽນເປັນພາສາລາວ ນີ້ແມ່ນການທົດສອບ"),
        ("my", "BURMESE", "ကျွန်ုပ်သည် မြန်မာဘာသာဖြင့် ရေးသည် ဤသည်မှာ စမ်းသပ်မှုဖြစ်သည်"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])
    # alpha-3 conversion covers every new code (merge stage, S10)
    import re as _re

    src = open(
        "/root/repo/warc_metadata_sidecar_spark/operators/cdxj.py", encoding="utf-8"
    ).read()
    for code, _n, _t in cases:
        assert _re.search(rf'"{code}": "\w+"', src), code


def test_signature_tranche_r6c():
    """r6c tail signatures: UNIX compress, HTML Help (ITSF), Windows
    cursor (ICO's image-type-2 sibling — must NOT read as ICO)."""
    cases = [
        (b"\x1f\x9d\x90abc", "application/x-compress", None),
        (b"ITSF\x03\x00\x00\x00", "application/vnd.ms-htmlhelp", None),
        (b"\x00\x00\x02\x00\x01\x00", "image/x-cursor", None),
        (b"\x00\x00\x01\x00\x01\x00", "image/vnd.microsoft.icon", "x-fmt/418"),
    ]
    for head, mime, puid in cases:
        got = sniff_mime(None, head)
        assert got == (mime, mime, puid), (head[:8], got)


def test_charset_bytes_r6_session3_rungs():
    """ISO-2022 escape family + Hebrew/Thai/Greek single-byte rungs on raw
    bytes, plus the negative space that shaped their ordering: Russian
    fails every new strict decode, sparse-accent French is held out by the
    run-adjacency gate, and CJK-as-tis620 (thai-share ~1.0!) is rejected
    by the Thai ORTHOGRAPHY gate (mark density + legality)."""
    from warc_metadata_sidecar_spark.functions.detectors import (
        detect_charset_bytes,
    )

    el = "Η Ελλάδα είναι χώρα της νοτιοανατολικής Ευρώπης με πρωτεύουσα την Αθήνα."
    he = "ישראל היא מדינה במזרח התיכון השוכנת לחוף הים התיכון ובירתה ירושלים"
    th = "ประเทศไทยตั้งอยู่ในเอเชียตะวันออกเฉียงใต้มีกรุงเทพมหานครเป็นเมืองหลวง"
    ja = "日本語のテキストです。これはテストです。"
    assert detect_charset_bytes(ja.encode("iso-2022-jp")) == ("ISO-2022-JP", 0.99)
    assert detect_charset_bytes("한국어 텍스트".encode("iso2022_kr")) == (
        "ISO-2022-KR", 0.99)
    assert detect_charset_bytes(el.encode("iso-8859-7")) == ("ISO-8859-7", 0.73)
    assert detect_charset_bytes(he.encode("iso-8859-8")) == ("ISO-8859-8", 0.73)
    assert detect_charset_bytes(th.encode("tis_620")) == ("TIS-620", 0.73)
    # negatives: the orderings' load-bearing cases
    ru = "Российская Федерация расположена в Восточной Европе и Северной Азии."
    assert detect_charset_bytes(ru.encode("windows-1251"))[0] == "windows-1251"
    assert detect_charset_bytes(ru.encode("koi8-r"))[0] == "KOI8-R"
    fr = "naïve café crème brûlée déjà vu français"
    assert detect_charset_bytes(fr.encode("latin-1"))[0] == "ISO-8859-1"
    # short marker-poor Big5 decodes as thai-share 1.0 under tis-620 but
    # fails the orthography gate (1 combining mark) — must NOT read Thai
    short_b5 = "臺灣位於東亞，首都為臺北。夜市文化聞名世界。".encode("big5")
    assert detect_charset_bytes(short_b5)[0] != "TIS-620"


def test_charset_artifact_iso2022_rung():
    """ISO-2022-JP survives the utf-8 ingest decode verbatim (7-bit), so
    the ARTIFACT path names it exactly — before the ascii rung claims the
    ESC-bearing text."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset

    ja = "日本語のテキストです。これはテストです。"
    mangled = ja.encode("iso-2022-jp").decode("utf-8", "replace")
    assert detect_charset(mangled) == ("ISO-2022-JP", 0.99)
    assert detect_charset("plain ascii")[0] == "ascii"


def test_charset_bytes_r7_utf_16_32_bomless():
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset_bytes

    """NUL-interleave fingerprint: width + endianness from WHERE the zeros
    sit; BOM'd forms keep the generic names; UTF-32LE BOM no longer
    prefix-matches as UTF-16."""
    t = "plain ascii text rendered wide"
    assert detect_charset_bytes(t.encode("utf-16-le")) == ("UTF-16LE", 1.0)
    assert detect_charset_bytes(t.encode("utf-16-be")) == ("UTF-16BE", 1.0)
    assert detect_charset_bytes(t.encode("utf-32-le")) == ("UTF-32LE", 1.0)
    assert detect_charset_bytes(t.encode("utf-32-be")) == ("UTF-32BE", 1.0)
    assert detect_charset_bytes(t.encode("utf-16")) == ("UTF-16", 1.0)
    assert detect_charset_bytes(t.encode("utf-32")) == ("UTF-32", 1.0)
    # mixed ascii+Cyrillic still resolves endianness from the ascii NULs
    mixed = "report 2024 Россия region data and totals".encode("utf-16-le")
    assert detect_charset_bytes(mixed) == ("UTF-16LE", 1.0)


def test_charset_bytes_r7_arabic_rungs():
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset_bytes

    """Arabic before Greek/Cyrillic: iso-8859-6 via its strict decode,
    cp1256 via the alef/lam spikes; Russian and Greek never reach either
    (hole bytes / marker shares), and keep their own rungs."""
    ar = "تقع المملكة العربية السعودية في غرب آسيا، وعاصمتها الرياض."
    assert detect_charset_bytes(ar.encode("cp1256")) == ("windows-1256", 0.73)
    assert detect_charset_bytes(ar.replace("،", " ").encode("iso-8859-6")) == (
        "ISO-8859-6",
        0.73,
    )
    ru = "Российская Федерация расположена в Восточной Европе и Северной Азии."
    assert detect_charset_bytes(ru.encode("cp1251")) == ("windows-1251", 0.73)
    assert detect_charset_bytes(ru.encode("koi8-r")) == ("KOI8-R", 0.73)
    gr = "Η Ελλάδα είναι χώρα της νοτιοανατολικής Ευρώπης με πρωτεύουσα την Αθήνα."
    assert detect_charset_bytes(gr.encode("iso-8859-7")) == ("ISO-8859-7", 0.73)


def test_charset_bytes_r7_vietnamese_rung():
    from warc_metadata_sidecar_spark.functions.detectors import detect_charset_bytes

    """cp1258 combining tones + horn vowels fire the Vietnamese rung; the
    sparse-accent Latin counterexamples stay on the western rungs."""
    from warc_metadata_sidecar_spark.driver_queries import _CHARSET_FIXTURES

    viet = next(p for c, n, _, p in _CHARSET_FIXTURES if c == "cp1258")
    assert detect_charset_bytes(viet.encode("cp1258")) == ("windows-1258", 0.73)
    assert detect_charset_bytes(
        "naïve café crème brûlée déjà vu français".encode("latin-1")
    ) == ("ISO-8859-1", 0.73)
    assert detect_charset_bytes(
        "don’t say “never ever” again l’été".encode("cp1252")
    ) == ("Windows-1252", 0.73)


def test_signature_tranche_r7():
    """r7 PUID tranche: new leading signatures, the PDF/A XMP sub-sniff
    over the version byte, and the OLE2 directory-name fallback."""
    cases = [
        (b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 8, "image/jp2", "x-fmt/392"),
        (b"\xabKTX 11\xbb\r\n\x1a\n" + b"\x00" * 8, "image/ktx", None),
        (b"qoif" + b"\x00" * 12, "image/qoi", None),
        (b"\x76\x2f\x31\x01" + b"\x00" * 8, "image/x-exr", None),
        (b"BPG\xfb" + b"\x00" * 8, "image/bpg", None),
        (b"farbfeld" + b"\x00" * 8, "image/farbfeld", None),
        (b"DDS |\x00\x00\x00", "image/vnd.ms-dds", None),
        (b"Cr24\x03\x00\x00\x00", "application/x-chrome-extension", None),
        (b"LZIP\x01", "application/x-lzip", None),
        (b"SZDD\x88\xf0\x27\x33A\x00", "application/x-ms-compress-szdd", None),
        (b"\xcf\xfa\xed\xfe\x07\x00\x00\x01", "application/x-mach-binary", None),
        (b"\xc5\xd0\xd3\xc6 binary eps header", "application/postscript", "fmt/124"),
        (b"\x4c\x00\x00\x00\x01\x14\x02\x00 link", "application/x-ms-shortcut", None),
    ]
    for head, mime, puid in cases:
        f, m, p = sniff_mime(None, head)
        assert (f, m, p) == (mime, mime, puid), head[:8]
    # PDF/A: pdfaid packet in the head outranks the version byte
    pdfa = b"%PDF-1.4 ... <rdf pdfaid:part>1</rdf pdfaid:conformance>B< ..."
    assert sniff_mime(None, pdfa)[2] == "fmt/354"
    pdfa2a = b'%PDF-1.7 ... pdfaid:part="2" pdfaid:conformance="A" ...'
    assert sniff_mime(None, pdfa2a)[2] == "fmt/476"
    assert sniff_mime(None, b"%PDF-1.4 plain")[2] == "fmt/18"
    # OLE2: first-sector marker missing, directory name decides; unknown
    # names stay generic fmt/111
    ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 504
    doc = ole + b"\x00\x00\x00\x00" + "WordDocument".encode("utf-16-le")
    assert sniff_mime(None, doc)[2] == "fmt/40"
    xls = ole + b"\x00\x00\x00\x00" + "Workbook".encode("utf-16-le")
    assert sniff_mime(None, xls)[2] == "fmt/61"
    assert sniff_mime(None, ole + b"\x00" * 64)[2] == "fmt/111"


def test_language_r7_token_profiles():
    """r7 tranche: Swahili, Tagalog, Albanian, Azerbaijani (split from
    Turkish via its ə-bearing forms), Estonian (split from Finnish),
    Lithuanian + Latvian (mutual 'ir' dropped from both) — and the
    near-neighbor languages must not flip."""
    from warc_metadata_sidecar_spark.functions.detectors import detect_language

    cases = [
        ("sw", "SWAHILI", "lugha ya kiswahili inazungumzwa katika nchi nyingi "
                          "za afrika mashariki kwa hiyo watu wengi sana "
                          "wanasema kwamba hii ni lugha ambayo itaendelea "
                          "kuwa muhimu lakini pia kama wake na yake"),
        ("tl", "TAGALOG", "ang wikang tagalog ay sinasalita ng mga tao sa "
                          "pilipinas ito ang batayan ng wikang pambansa hindi "
                          "lamang siya ginagamit ngayon kundi naman sa "
                          "kanyang kasaysayan dahil mayroon itong ating diwa"),
        ("sq", "ALBANIAN", "gjuha shqipe është një gjuhë që flitet nga shumë "
                           "njerëz dhe për këtë arsye janë bërë studime duke "
                           "treguar se kjo gjuhë sipas historisë nëse shihet "
                           "megjithatë mbetet e veçantë në ballkan të gjithë"),
        ("az", "AZERBAIJANI", "azərbaycan dili haqqında məlumat dövlət "
                              "tərəfindən verilir və bu dil müxtəlif "
                              "bölgələrdə istifadə olunur həmçinin qonşu "
                              "ölkələrdə yayılmışdır ilə görə qəbul "
                              "edilmişdir"),
        ("et", "ESTONIAN", "eesti keel on soome keele sugulane kuid nende "
                           "vahel on palju erinevusi ning pärast pikka aega "
                           "arenes ta omaette selle tõttu räägib rohkem kui "
                           "miljon inimest seda oma emakeelena üle maa kõik "
                           "ka aasta jooksul seoses sellega"),
        ("lt", "LITHUANIAN", "lietuvių kalba yra viena seniausių kalbų nes "
                             "buvo išlaikyta per amžius tačiau pagal "
                             "kalbininkus labai daug formų išliko iš senovės "
                             "savo struktūra kad apie tai kalbama dažnai "
                             "taip pat mokslo metu"),
        ("lv", "LATVIAN", "latviešu valoda tiek runāta latvijā un arī citur "
                          "pasaulē pēc neatkarības atjaunošanas tikai tā "
                          "kļuva par valsts valodu starp citu vairāk nekā "
                          "miljons cilvēku kurā katru gada dienu lieto savu "
                          "valodu kas varētu būt vai ne"),
    ]
    for code, name, text in cases:
        got = detect_language(text)
        assert got is not None, code
        top = got["languages"][0]
        assert (top["code"], top["name"]) == (code, name), (code, got["languages"][:2])
    # neighbors stay put: Turkish (bir/bu/daha core Azerbaijani avoids),
    # Finnish (ja/on/ei core Estonian avoids), Indonesian (its yang/dan
    # core is deliberately NOT split into a Malay profile), Croatian
    # ('na' kept out of Swahili/Tagalog)
    tr = ("türkçe bir dil ve bu dil için ile birlikte olarak daha çok "
          "insan gibi ancak sonra kadar olan ama değil")
    assert detect_language(tr)["languages"][0]["code"] == "tr"
    fi = ("suomen kieli ja sen puhujat on täällä ei vain suomessa että se "
          "hän oli mutta myös kuin niin jos ovat sekä muualla")
    assert detect_language(fi)["languages"][0]["code"] == "fi"
    hr = ("hrvatski jezik što se govori u hrvatskoj ili koji također ima "
          "povijest nakon mnogo godina zbog toga između prema tijekom "
          "stoljeća gdje su svoje oblike bio sačuvao")
    assert detect_language(hr)["languages"][0]["code"] == "hr"
