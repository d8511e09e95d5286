"""WHATWG-encoding-compatible text decoding on top of Python codecs.

The reference decodes with the platform ``TextDecoder`` (util.js:364-377):
unknown labels fall back to UTF-8, decoders are cached, and a BOM matching the
encoding is stripped. This module reproduces that behavior with an explicit
WHATWG label → Python codec map (the labels are from the WHATWG Encoding
Standard; the codec names are Python's). ``x-user-defined`` has no Python
codec and is implemented directly.
"""

from __future__ import annotations

from functools import lru_cache

# WHATWG label → Python codec. Each WHATWG encoding's canonical name is listed
# with its label aliases; mappings chosen to match WHATWG decode behavior
# (shift_jis→cp932, euc-kr→cp949, gb*→gb18030/gbk, big5→big5hkscs).
_LABELS: dict[str, str] = {}


def _register(python_codec: str, *labels: str) -> None:
    for label in labels:
        _LABELS[label] = python_codec


_register("utf_8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
          "utf-8", "utf8", "x-unicode20utf8")
_register("cp866", "866", "cp866", "csibm866", "ibm866")
_register("iso8859_2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
          "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
_register("iso8859_3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
          "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
_register("iso8859_4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
          "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
_register("iso8859_5", "csisolatincyrillic", "cyrillic", "iso-8859-5",
          "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5",
          "iso_8859-5:1988")
_register("iso8859_6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
          "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
          "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596",
          "iso_8859-6", "iso_8859-6:1987")
_register("iso8859_7", "csisolatingreek", "ecma-118", "elot_928", "greek",
          "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597",
          "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek")
_register("iso8859_8", "csiso88598e", "csisolatinhebrew", "hebrew",
          "iso-8859-8", "iso-8859-8-e", "iso8859-8", "iso88598",
          "iso_8859-8", "iso_8859-8:1988", "visual")
_register("iso8859_8", "csiso88598i", "iso-8859-8-i", "logical")
_register("iso8859_10", "csisolatin6", "iso-8859-10", "iso-ir-157",
          "iso8859-10", "iso885910", "l6", "latin6")
_register("iso8859_13", "iso-8859-13", "iso8859-13", "iso885913")
_register("iso8859_14", "iso-8859-14", "iso8859-14", "iso885914")
_register("iso8859_15", "csisolatin9", "iso-8859-15", "iso8859-15",
          "iso885915", "iso_8859-15", "l9")
_register("iso8859_16", "iso-8859-16")
_register("koi8_r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
_register("koi8_u", "koi8-ru", "koi8-u")
_register("mac_roman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
_register("cp874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911",
          "tis-620", "windows-874")
_register("cp1250", "cp1250", "windows-1250", "x-cp1250")
_register("cp1251", "cp1251", "windows-1251", "x-cp1251")
_register("cp1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1",
          "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591",
          "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii",
          "windows-1252", "x-cp1252")
_register("cp1253", "cp1253", "windows-1253", "x-cp1253")
_register("cp1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
          "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5",
          "latin5", "windows-1254", "x-cp1254")
_register("cp1255", "cp1255", "windows-1255", "x-cp1255")
_register("cp1256", "cp1256", "windows-1256", "x-cp1256")
_register("cp1257", "cp1257", "windows-1257", "x-cp1257")
_register("cp1258", "cp1258", "windows-1258", "x-cp1258")
_register("mac_cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
_register("gb18030", "chinese", "csgb2312", "csiso58gb231280", "gb2312",
          "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
_register("gb18030", "gb18030")
_register("big5hkscs", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_register("euc_jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
_register("iso2022_jp", "csiso2022jp", "iso-2022-jp")
_register("cp932", "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis",
          "sjis", "windows-31j", "x-sjis")
_register("cp949", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
          "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
          "windows-949")
_register("utf_16_be", "unicodefffe", "utf-16be")
_register("utf_16_le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
          "unicodefeff", "utf-16", "utf-16le")
_register("x-user-defined", "x-user-defined")
# "replacement" encoding: every byte becomes U+FFFD; mapped specially below
for _label in ("csiso2022kr", "hz-gb-2312", "iso-2022-cn", "iso-2022-cn-ext",
               "iso-2022-kr", "replacement"):
    _LABELS[_label] = "replacement"

_UTF8 = "utf_8"


@lru_cache(maxsize=256)
def _resolve(label: str | None) -> str:
    """Resolve a charset label to a Python codec name; unknown → UTF-8
    (the TextDecoder fallback at util.js:367-374)."""
    if label is None:
        return _UTF8
    name = label.strip().strip("\t\n\f\r ").lower()
    codec = _LABELS.get(name)
    if codec is None:
        return _UTF8
    return codec


def canonical(label: str | None) -> str:
    """Canonical python codec name for a label (utf-8 for unknown)."""
    return _resolve(label)


# The WHATWG windows-125x / windows-874 index files map every 0x80-0x9F
# position, falling back to the C1 control where Microsoft left the slot
# undefined (e.g. windows-1252 0x81 → U+0081 — TextDecoder emits the
# control, not U+FFFD). Python's cp125x codecs error on exactly those
# slots, so a custom error handler supplies the C1 fallback; bytes OUTSIDE
# 0x80-0x9F that fail (windows-1253 0xAA, windows-1255 0xD9…) are genuine
# WHATWG decode errors and stay U+FFFD.
_C1_FALLBACK_CODECS = frozenset(
    ("cp874", "cp1250", "cp1251", "cp1252", "cp1253", "cp1254", "cp1255",
     "cp1256", "cp1257", "cp1258"))


# beyond the C1 range, the WHATWG indexes map one slot Python leaves
# undefined in this family: windows-1255's 0xCA (HEBREW POINT HOLAM HASER
# FOR VAV, U+05BA). The handler cannot see which codec failed
# (err.encoding is just 'charmap'), but 0xCA decodes fine under every
# OTHER _C1_FALLBACK codec, so keying by byte alone is unambiguous.
_WHATWG_EXTRA = {0xCA: "ֺ"}


def _whatwg_c1_handler(err: UnicodeError):
    out = []
    for byte in err.object[err.start:err.end]:
        if 0x80 <= byte <= 0x9F:
            out.append(chr(byte))
        else:
            out.append(_WHATWG_EXTRA.get(byte, "�"))
    return "".join(out), err.end


import codecs as _codecs  # noqa: E402  (handler registration at import)

_codecs.register_error("whatwg_c1", _whatwg_c1_handler)


def decode_string(data: bytes | bytearray | memoryview, charset: str | None = None) -> str:
    """Decode bytes like ``new TextDecoder(charset).decode(bytes)``:
    replacement on errors, BOM stripped when it matches the encoding,
    unknown labels → UTF-8."""
    data = bytes(data)
    codec = _resolve(charset)
    if codec == "replacement":
        return "�" if data else ""
    if codec == "x-user-defined":
        return "".join(
            chr(b) if b < 0x80 else chr(0xF780 + b - 0x80) for b in data
        )
    if codec == _UTF8 and data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    elif codec == "utf_16_le" and data[:2] == b"\xff\xfe":
        data = data[2:]
    elif codec == "utf_16_be" and data[:2] == b"\xfe\xff":
        data = data[2:]
    errors = "whatwg_c1" if codec in _C1_FALLBACK_CODECS else "replace"
    try:
        return data.decode(codec, errors=errors)
    except LookupError:  # pragma: no cover - every mapped codec exists
        return data.decode("utf-8", errors="replace")


def encode_string(text: str) -> bytes:
    """UTF-8 encode (TextEncoder equivalent)."""
    return text.encode("utf-8")


def encode_single_byte_charset(text: str, charset: str) -> bytes:
    """Invert the decoder for a single-byte charset, exactly like the
    reference's test helper (test/helpers/mhtml.js:41-58): fixtures and engine
    share one mapping by construction."""
    codec = _resolve(charset)
    errors = "whatwg_c1" if codec in _C1_FALLBACK_CODECS else "replace"
    table: dict[str, int] = {}
    for byte in range(0x100):
        # the exact inverse of decode_string's mapping, C1 fallback included
        table[bytes([byte]).decode(codec, errors=errors)] = byte
    out = bytearray()
    for character in text:
        byte = table.get(character)
        if byte is None:
            raise ValueError(f"{character!r} cannot be encoded in {charset}")
        out.append(byte)
    return bytes(out)


def is_known_label(label: str) -> bool:
    return label.strip().lower() in _LABELS


__all__ = [
    "canonical",
    "decode_string",
    "encode_string",
    "encode_single_byte_charset",
    "is_known_label",
]