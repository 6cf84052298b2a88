"""WHATWG-compatible URL parsing/resolution (pure Python, no deps).

The reference resolves every link with the WHATWG URL parser
(``new URL(href, base)`` — /root/reference/src/shared/links.ts:9-15 and
src/scrapeDocument/detectors.ts:22-28). Python's ``urllib.parse.urljoin`` is
RFC 3986 and diverges (backslashes, ``..`` overflow, default ports, space
encoding), so we implement the subset of the WHATWG algorithm that web URLs
exercise.  Differentially tested against Node's built-in ``new URL`` in
tests/test_urlops.py.

Intentional subset: no IDNA/punycode beyond Python's codec, simplified IPv6
(brackets validated + lowercased, not re-serialized), no ``file:`` drive
letters.  Parse failures raise URLParseError; callers fall back like the
reference does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

__all__ = [
    "URLParseError",
    "URLRecord",
    "parse_url",
    "whatwg_resolve",
    "resolve_href",
    "canonicalize_url",
    "url_host",
]


class URLParseError(ValueError):
    pass


SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21, "file": None}

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*:")
# C0 controls and space — trimmed from both ends of input.
_LEAD_TRAIL = "".join(chr(c) for c in range(0x21)) + " "
# ASCII tab/newline — removed everywhere in input.
_TAB_NL = dict.fromkeys(map(ord, "\t\n\r"))

# Percent-encode sets (ASCII chars to encode; C0 and >0x7e always encoded).
_FRAGMENT_EXTRA = frozenset(' "<>`')
_QUERY_EXTRA = frozenset(' "#<>')
_SPECIAL_QUERY_EXTRA = _QUERY_EXTRA | frozenset("'")
_PATH_EXTRA = _QUERY_EXTRA | frozenset("?`{}")
_USERINFO_EXTRA = _PATH_EXTRA | frozenset("/:;=@[\\]^|")

_FORBIDDEN_HOST = set("\x00\t\n\r #/:<>?@[\\]^|")


def _pct_encode(s: str, extra: frozenset) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or cp > 0x7E or ch in extra:
            out.append("".join("%%%02X" % b for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


_PCT_RE = re.compile("%([0-9A-Fa-f]{2})")


def _pct_decode(s: str) -> str:
    # Decode bytes then utf-8 (errors surrogate-escaped → host check catches junk)
    def sub(m):
        return chr(int(m.group(1), 16))

    return _PCT_RE.sub(sub, s)


@dataclass
class URLRecord:
    scheme: str
    username: str = ""
    password: str = ""
    host: str | None = None  # serialized host ('' is a valid host for file:)
    port: int | None = None
    path: str = ""  # serialized path, '/'-rooted unless opaque
    opaque_path: bool = False
    query: str | None = None
    fragment: str | None = None

    @property
    def is_special(self) -> bool:
        return self.scheme in SPECIAL_SCHEMES

    def href(self) -> str:
        out = [self.scheme, ":"]
        if self.host is not None:
            out.append("//")
            if self.username or self.password:
                out.append(self.username)
                if self.password:
                    out.append(":" + self.password)
                out.append("@")
            out.append(self.host)
            if self.port is not None:
                out.append(":" + str(self.port))
        path = self.path
        if not self.opaque_path and self.is_special and path == "":
            path = "/"
        if self.host is None and not self.opaque_path and path.startswith("//"):
            out.append("/.")  # spec: avoid //path being read as authority
        out.append(path)
        if self.query is not None:
            out.append("?" + self.query)
        if self.fragment is not None:
            out.append("#" + self.fragment)
        return "".join(out)


def _preprocess(s: str) -> str:
    s = s.strip(_LEAD_TRAIL)
    return s.translate(_TAB_NL)


def _dot_norm(seg: str) -> str:
    return seg.replace("%2e", ".").replace("%2E", ".").replace("%2E", ".")


def _normalize_path(raw: str, special: bool) -> str:
    """Serialize a '/'-rooted path: backslash folding (special), dot-segment
    removal with %2e handling, per-segment percent-encoding.

    Special schemes always keep at least '/'; non-special schemes follow the
    string-based shorten-path behavior (a final '..' leaves a trailing '/'
    only when it actually erased a segment — matches Node/ada, see
    tests/test_urlops.py differential corpus)."""
    if special:
        raw = raw.replace("\\", "/")
    if not raw.startswith("/"):
        raw = "/" + raw
    segs = raw.split("/")[1:]
    n = len(segs)
    if special:
        out: list[str] = []
        for i, seg in enumerate(segs):
            norm = _dot_norm(seg)
            last = i == n - 1
            if norm == ".":
                if last:
                    out.append("")
            elif norm == "..":
                if out:
                    out.pop()
                if last:
                    out.append("")
            else:
                out.append(_pct_encode(seg, _PATH_EXTRA))
        return "/" + "/".join(out)
    path = ""
    for i, seg in enumerate(segs):
        norm = _dot_norm(seg)
        last = i == n - 1
        if norm == ".":
            if last:
                path += "/"
        elif norm == "..":
            erased = "/" in path
            path = path[: path.rfind("/")] if erased else path
            if last and erased:
                path += "/"
        else:
            path += "/" + _pct_encode(seg, _PATH_EXTRA)
    return path


_IPV4_NUM = re.compile(r"^(0[xX][0-9a-fA-F]*|0[0-7]*|[1-9][0-9]*|0)$")


def _parse_ipv4_part(p: str) -> int:
    if p.startswith(("0x", "0X")):
        return int(p[2:], 16) if len(p) > 2 else 0
    if len(p) > 1 and p.startswith("0"):
        return int(p, 8)
    return int(p)


def _maybe_ipv4(host: str) -> str | None:
    """Return normalized dotted-quad if host is an IPv4 address, raise if it
    ends in a numeric label but is invalid, else None."""
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if not parts:
        return None
    if not _IPV4_NUM.match(parts[-1]):
        return None
    if not all(_IPV4_NUM.match(p) for p in parts):
        raise URLParseError(f"invalid IPv4-like host: {host!r}")
    if len(parts) > 4:
        raise URLParseError(f"invalid IPv4 host: {host!r}")
    nums = [_parse_ipv4_part(p) for p in parts]
    if any(n > 255 for n in nums[:-1]) or nums[-1] >= 256 ** (5 - len(nums)):
        raise URLParseError(f"IPv4 part out of range: {host!r}")
    ipv4 = nums[-1]
    for i, n in enumerate(nums[:-1]):
        ipv4 += n * 256 ** (3 - i)
    return ".".join(str((ipv4 >> (8 * (3 - i))) & 0xFF) for i in range(4))


def _parse_host(raw: str, special: bool) -> str:
    if raw.startswith("["):
        if not raw.endswith("]"):
            raise URLParseError(f"unclosed IPv6 bracket: {raw!r}")
        inner = raw[1:-1]
        if not inner or not re.fullmatch(r"[0-9a-fA-F:.]+", inner):
            raise URLParseError(f"invalid IPv6 host: {raw!r}")
        return raw.lower()
    if not special:
        # opaque host: forbidden chars minus %; percent-encode C0
        for ch in raw:
            if ch in _FORBIDDEN_HOST and ch != "%":
                raise URLParseError(f"forbidden host char in {raw!r}")
        return _pct_encode(raw, frozenset())
    if raw == "":
        raise URLParseError("empty host for special scheme")
    dec = _pct_decode(raw)
    for ch in dec:
        if ch in _FORBIDDEN_HOST or ch == "%":
            raise URLParseError(f"forbidden host char in {dec!r}")
    dec = dec.lower()
    if not dec.isascii():
        try:
            dec = dec.encode("idna").decode("ascii")
        except UnicodeError as e:  # pragma: no cover - exotic hosts
            raise URLParseError(f"IDNA failure for {dec!r}") from e
    for label in dec.split("."):
        if label.startswith("xn--"):
            try:
                label[4:].encode("ascii").decode("punycode")
            except UnicodeError as e:
                raise URLParseError(f"invalid punycode label {label!r}") from e
    ipv4 = _maybe_ipv4(dec)
    return ipv4 if ipv4 is not None else dec


def _split_fragment_query(s: str) -> tuple[str, str | None, str | None]:
    frag = None
    h = s.find("#")
    if h != -1:
        frag = s[h + 1 :]
        s = s[:h]
    query = None
    q = s.find("?")
    if q != -1:
        query = s[q + 1 :]
        s = s[:q]
    return s, query, frag


def _parse_authority_and_path(scheme: str, rest: str) -> URLRecord:
    special = scheme in SPECIAL_SCHEMES
    rest, query, fragment = _split_fragment_query(rest)
    # authority ends at first '/' (or '\' for special)
    end = len(rest)
    for i, ch in enumerate(rest):
        if ch == "/" or (special and ch == "\\"):
            end = i
            break
    auth, path_raw = rest[:end], rest[end:]
    username = password = ""
    at = auth.rfind("@")
    if at != -1:
        userinfo, auth = auth[:at], auth[at + 1 :]
        if ":" in userinfo:
            u, _, p = userinfo.partition(":")
        else:
            u, p = userinfo, ""
        username = _pct_encode(u, _USERINFO_EXTRA)
        password = _pct_encode(p, _USERINFO_EXTRA)
    # split port (outside brackets)
    host_raw, port = auth, None
    if auth.startswith("["):
        close = auth.find("]")
        if close == -1:
            raise URLParseError(f"unclosed IPv6 bracket: {auth!r}")
        host_raw = auth[: close + 1]
        tail = auth[close + 1 :]
        if tail.startswith(":"):
            port = _parse_port(tail[1:], scheme)
        elif tail:
            raise URLParseError(f"junk after IPv6 host: {auth!r}")
    else:
        colon = auth.rfind(":")
        if colon != -1:
            host_raw, port = auth[:colon], _parse_port(auth[colon + 1 :], scheme)
    host = _parse_host(host_raw, special)
    path = _normalize_path(path_raw, special) if path_raw else ("" if not special else "/")
    rec = URLRecord(scheme, username, password, host, port, path, False, None, None)
    rec.query = _encode_query(query, special)
    rec.fragment = _pct_encode(fragment, _FRAGMENT_EXTRA) if fragment is not None else None
    return rec


def _parse_port(p: str, scheme: str) -> int | None:
    if p == "":
        return None
    if not p.isdigit():
        raise URLParseError(f"invalid port {p!r}")
    v = int(p)
    if v > 65535:
        raise URLParseError(f"port out of range {p!r}")
    if SPECIAL_SCHEMES.get(scheme) == v:
        return None
    return v


def _encode_query(q: str | None, special: bool) -> str | None:
    if q is None:
        return None
    return _pct_encode(q, _SPECIAL_QUERY_EXTRA if special else _QUERY_EXTRA)


def parse_url(input_str: str, base: URLRecord | str | None = None) -> URLRecord:
    if isinstance(base, str):
        base = parse_url(base)
    s = _preprocess(input_str)
    m = _SCHEME_RE.match(s)
    if m:
        scheme = m.group(0)[:-1].lower()
        rest = s[m.end() :]
        if scheme in SPECIAL_SCHEMES:
            if scheme == "file":
                raise URLParseError("file: URLs unsupported")
            starts_auth = len(rest) >= 2 and rest[0] in "/\\" and rest[1] in "/\\"
            if base is not None and base.scheme == scheme and not starts_auth:
                return _resolve_with_base(rest, base)
            stripped = rest.lstrip("/\\")
            return _parse_authority_and_path(scheme, stripped)
        # non-special
        if rest.startswith("//"):
            return _parse_authority_and_path(scheme, rest[2:])
        body, query, fragment = _split_fragment_query(rest)
        if body.startswith("/"):
            rec = URLRecord(scheme, path=_normalize_path(body, False))
        else:
            rec = URLRecord(scheme, path=_pct_encode(body, frozenset()), opaque_path=True)
        rec.query = _encode_query(query, False)
        rec.fragment = _pct_encode(fragment, _FRAGMENT_EXTRA) if fragment is not None else None
        return rec
    if base is None:
        raise URLParseError(f"relative URL without base: {input_str!r}")
    return _resolve_with_base(s, base)


def _resolve_with_base(s: str, base: URLRecord) -> URLRecord:
    special = base.is_special
    # Node/WHATWG quirk (differentially verified): a base's EMPTY query
    # ('https://h/p?') survives direct parsing but is dropped when copied
    # during relative resolution — new URL('', 'https://h/p?') and
    # new URL('#x', …) serialize without the '?'
    base_q = base.query or None
    if base.opaque_path and not s.startswith("#"):
        if s == "":
            return replace(base, fragment=None, query=base_q)
        raise URLParseError("cannot resolve against opaque-path base")
    if s == "":
        return replace(base, fragment=None, query=base_q)
    if s[0] == "#":
        return replace(base, fragment=_pct_encode(s[1:], _FRAGMENT_EXTRA), query=base_q)
    slash = "/\\" if special else "/"
    if len(s) >= 2 and s[0] in slash and s[1] in slash:
        return _with_scheme_defaults(_parse_authority_and_path(base.scheme, s.lstrip("/\\") if special else s[2:]))
    if s[0] == "?":
        body, query, fragment = _split_fragment_query(s[1:])
        q = body if query is None else body + "?" + query  # '?' inside query kept
        rec = replace(base, query=_encode_query(q, special), fragment=None)
        if fragment is not None:
            rec = replace(rec, fragment=_pct_encode(fragment, _FRAGMENT_EXTRA))
        return rec
    body, query, fragment = _split_fragment_query(s)
    if body and body[0] in slash:
        path = _normalize_path(body, special)
    else:
        # merge with base path: everything up to and including last '/'
        bp = base.path
        merged = bp[: bp.rfind("/") + 1] + body if "/" in bp else "/" + body
        path = _normalize_path(merged, special)
    rec = replace(base, path=path, opaque_path=False, query=_encode_query(query, special), fragment=None)
    if fragment is not None:
        rec = replace(rec, fragment=_pct_encode(fragment, _FRAGMENT_EXTRA))
    return rec


def _with_scheme_defaults(rec: URLRecord) -> URLRecord:
    return rec


def whatwg_resolve(href: str, base: str | None = None) -> str:
    """``new URL(href, base).toString()`` equivalent; raises URLParseError."""
    return parse_url(href, base).href()


def resolve_href(href: str, base_url: str) -> str:
    """Reference semantics (src/shared/links.ts:9-15): resolve, passthrough
    the *original* href on any parse failure."""
    try:
        return whatwg_resolve(href, base_url)
    except (URLParseError, ValueError):
        return href


def url_host(url: str) -> str | None:
    """Host of an absolute URL, or None if unparseable."""
    try:
        return parse_url(url).host
    except (URLParseError, ValueError):
        return None


def canonicalize_url(url: str) -> str | None:
    """Frontier canonical form: WHATWG-normalized absolute http(s) URL with
    the fragment dropped, plus the reference's download-page trailing-slash
    rule (src/scrapeDocument.ts:129-148). None if not a crawlable URL."""
    try:
        rec = parse_url(url)
    except (URLParseError, ValueError):
        return None
    if rec.scheme not in ("http", "https") or rec.host is None:
        return None
    rec = replace(rec, fragment=None)
    out = rec.href()
    # normalizeDownloadPageUrl — /download/ pages get a trailing slash
    if "/download/" in out and "?" not in out and not out.endswith("/"):
        if not re.search(r"\.[a-z0-9]{2,8}$", rec.path, re.IGNORECASE):
            out += "/"
    return out
