"""Domain-specific string formats: Email / Domain / IP / URI / Query
(SURVEY.md §2.7; reference /root/reference/pkg/rules/net/).

Reimplemented as pure Catalyst Column predicates (rlike / split /
regexp_extract / numeric range) — no UDFs, fully whole-stage-codegen'd
and pushdown-friendly. Violation codes mirror the reference: structural
format failures are ``PATTERN`` with granular messages
(net/email.go:177-213, net/ip.go:133), membership is
``NOTALLOWED``/``DENIED``, port bounds are ``MIN``/``MAX``, bad
percent-encoding is ``ENCODING`` (net/uri.go:38-55).

Scope notes vs the reference:
- ``with_tld()`` defaults to the full vendored IANA registry list
  (rules/tlds.py — the same data the reference generates into
  net/tlds.go; regenerate with scripts/gen_tlds.py).
- Domain punycode normalization (net/domain.go:174-204 via
  ``idna.ToASCII``) is opt-in via ``Domain().with_punycode()`` — one
  Arrow-batched stdlib-idna kernel ahead of the codegen'd label checks,
  so the default ASCII path stays UDF-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import Code
from .base import Rule, RuleSet, violation_struct
from .string import StringRuleSet

# ---------------------------------------------------------------------------
# Domain (reference net/domain.go:63-65,174-204)
# ---------------------------------------------------------------------------

_LABEL = r"[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
DOMAIN_RE = rf"^{_LABEL}(\.{_LABEL})*$"

from .tlds import IANA_TLDS


def punycode_normalize(col: Column) -> Column:
    """IDN → ASCII (punycode) normalization, one Arrow-batched kernel
    over stdlib IDNA (the Python analog of the reference's
    ``idna.ToASCII``, net/domain.go:174-204). Values that cannot be
    encoded pass through unchanged and fail the downstream label regex,
    mirroring the reference's error-on-invalid behavior."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _norm(batch):  # Series -> Series
        out = []
        for s in batch:
            if s is None:
                out.append(None)
                continue
            try:
                out.append(".".join(
                    lbl.encode("idna").decode("ascii") if lbl else lbl
                    for lbl in str(s).split(".")))
            except UnicodeError:
                out.append(s)
        return pd.Series(out)

    return pandas_udf(_norm, T.StringType())(col)


def _tld(col: Column) -> Column:
    return F.lower(F.substring_index(col, ".", -1))


@dataclass(frozen=True)
class DomainRuleSet(StringRuleSet):
    """Hostname validation: per-label charset/length + total length
    (reference net/domain.go:174-204; label pattern domain.go:21)."""

    punycode: bool = False

    def with_punycode(self) -> "DomainRuleSet":
        """Normalize IDN inputs to punycode ASCII before validation
        (reference domain.go:174-204 idna.ToASCII). Off by default so
        the ASCII path carries no UDF."""
        return self._clone(punycode=True)

    def coerce(self, col: Column, input_type: str):
        value, ok, code = super().coerce(col, input_type)
        if self.punycode:
            value = punycode_normalize(value)
        return value, ok, code

    def _structural(self) -> "DomainRuleSet":
        out = self._with_rule(Rule(
            Code.PATTERN, lambda c: c.rlike(DOMAIN_RE),
            "invalid domain label", conflict_key="domain_format"))
        return out._with_rule(Rule(
            Code.MAX_LEN, lambda c: F.octet_length(c) <= 253,
            "domain must be at most 253 characters",
            conflict_key="domain_len"))

    def with_tld(self, *tlds: str) -> "DomainRuleSet":
        """Require the final label to be a known TLD (reference WithTLD
        over the generated IANA list, net/tlds.go). Defaults to the full
        vendored registry; compiles to one Catalyst InSet."""
        allowed = tuple(sorted({t.lower() for t in (tlds or IANA_TLDS)}))
        return self._with_rule(Rule(
            Code.NOTALLOWED, lambda c: _tld(c).isin(*allowed),
            "top-level domain is not recognized",
            conflict_key="domain_tld", params={"tlds": allowed}))

    def with_suffix(self, *suffixes: str) -> "DomainRuleSet":
        """Label-aligned suffix match: value equals a suffix or ends with
        ".suffix" (reference WithSuffix, net/rule_domain_suffix.go:22-134).
        Cumulative across calls."""
        prior = [r for r in self.rules if r.conflict_key == "domain_suffix"]
        merged = tuple(sorted(
            {s.lower() for s in (prior[0].params["suffixes"] if prior else ())}
            | {s.lower() for s in suffixes}))

        def pred(c: Column) -> Column:
            lc = F.lower(c)
            out = F.lit(False)
            for s in merged:
                out = out | (lc == s) | lc.endswith("." + s)
            return out

        return self._with_rule(Rule(
            Code.NOTALLOWED, pred, "domain does not match an allowed suffix",
            conflict_key="domain_suffix", params={"suffixes": merged}))


def Domain() -> DomainRuleSet:
    return DomainRuleSet()._structural()


# ---------------------------------------------------------------------------
# Email (reference net/email.go:59-61,171-260)
# ---------------------------------------------------------------------------

_LOCAL_ATOM = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
LOCAL_RE = rf"^{_LOCAL_ATOM}(\.{_LOCAL_ATOM})*$"


def _local(col: Column) -> Column:
    return F.substring_index(col, "@", 1)


def _email_domain(col: Column) -> Column:
    return F.substring_index(col, "@", -1)


def _one_at(col: Column) -> Column:
    return F.size(F.split(col, "@", -1)) == 2


@dataclass(frozen=True)
class EmailRuleSet(StringRuleSet):
    """Email validation (reference net/email.go:171-248): exactly one
    ``@``; local-part charset + dot placement; domain validated by a
    nested :class:`DomainRuleSet` (default requires a known TLD, matching
    the reference default, email.go:190-192)."""

    def _structural(self) -> "EmailRuleSet":
        out = self
        out = out._with_rule(Rule(
            Code.PATTERN, lambda c: F.instr(c, "@") > 0,
            "missing @ symbol", conflict_key="email_at_missing"))
        out = out._with_rule(Rule(
            Code.PATTERN,
            lambda c: (F.instr(c, "@") == 0) | _one_at(c),
            "too many @ symbols", conflict_key="email_at_many"))
        # local-part checks only meaningful once exactly one '@' exists
        out = out._with_rule(Rule(
            Code.PATTERN,
            lambda c: ~_one_at(c) | _local(c).rlike(LOCAL_RE),
            "invalid local part", conflict_key="email_local"))
        return out

    def with_domain(self, domain_rs: DomainRuleSet) -> "EmailRuleSet":
        """Custom domain sub-rule-set (reference WithDomain,
        net/email.go:255-260). Each domain rule is lifted into an email
        rule gated on the one-@ structural precondition; replaces the
        previous domain rule set."""
        out = self._clone(rules=tuple(
            r for r in self.rules if not (r.conflict_key or "").startswith("email_domain")))
        for i, dr in enumerate(domain_rs.rules):
            out = out._with_rule(Rule(
                dr.rule_id,
                (lambda c, p=dr.predicate: ~_one_at(c) | p(_email_domain(c))),
                f"invalid domain: {dr.message}",
                conflict_key=f"email_domain_{i}_{dr.conflict_key}",
                params=dr.params))
        return out


def Email() -> EmailRuleSet:
    return EmailRuleSet()._structural().with_domain(Domain().with_tld())


# ---------------------------------------------------------------------------
# IP (reference net/ip.go:58-60, rule_ip_version.go, rule_ip_range.go,
#     rule_ip_cidr.go, rule_ip_public_private.go)
# ---------------------------------------------------------------------------

_V4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
_V4_BODY = rf"({_V4_OCTET}\.){{3}}{_V4_OCTET}"
IPV4_RE = rf"^{_V4_BODY}$"
# structural IPv6: full, compressed (::), and IPv4-embedded tails
# (::ffff:192.0.2.1 / 64:ff9b::1.2.3.4 — Go netip accepts these, so the
# structural gate must too)
_H = r"[0-9A-Fa-f]{1,4}"
IPV6_RE = (
    rf"^({_H}:){{7}}{_H}$"
    rf"|^({_H}:){{1,7}}:$"
    rf"|^({_H}:){{1,6}}:{_H}$"
    rf"|^({_H}:){{1,5}}(:{_H}){{1,2}}$"
    rf"|^({_H}:){{1,4}}(:{_H}){{1,3}}$"
    rf"|^({_H}:){{1,3}}(:{_H}){{1,4}}$"
    rf"|^({_H}:){{1,2}}(:{_H}){{1,5}}$"
    rf"|^{_H}:(:{_H}){{1,6}}$"
    rf"|^:((:{_H}){{1,7}}|:)$"
    rf"|^({_H}:){{6}}{_V4_BODY}$"          # full with dotted-quad tail
    # compressed with v4 tail: the tail counts as 2 of the 8 groups and
    # '::' stands for >=1 zero group, so expressed hex groups before+after
    # '::' must total <=5 — enumerate the bounded splits (an unbounded
    # ({H}:)* here over-accepted 9+-group forms Go netip rejects)
    rf"|^({_H}:){{1}}:({_H}:){{0,4}}{_V4_BODY}$"
    rf"|^({_H}:){{2}}:({_H}:){{0,3}}{_V4_BODY}$"
    rf"|^({_H}:){{3}}:({_H}:){{0,2}}{_V4_BODY}$"
    rf"|^({_H}:){{4}}:({_H}:){{0,1}}{_V4_BODY}$"
    rf"|^({_H}:){{5}}:{_V4_BODY}$"
    rf"|^::({_H}:){{0,5}}{_V4_BODY}$"      # leading ::, v4 tail
)


def _is_v4(col: Column) -> Column:
    return col.rlike(IPV4_RE)


def _is_v6(col: Column) -> Column:
    return col.rlike(IPV6_RE)


def ip4_to_long(col: Column) -> Column:
    """Dotted-quad → int64, JVM-side (split + weighted sum)."""
    parts = F.split(col, r"\.")
    return (parts.getItem(0).cast("long") * 16777216
            + parts.getItem(1).cast("long") * 65536
            + parts.getItem(2).cast("long") * 256
            + parts.getItem(3).cast("long"))


def _cidr_bounds(cidr: str) -> tuple:
    ip, bits = cidr.split("/")
    bits = int(bits)
    o = [int(x) for x in ip.split(".")]
    base = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
    lo = base & mask
    return lo, lo | ((1 << (32 - bits)) - 1)

_PRIVATE_V4_CIDRS = ("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
                     "127.0.0.0/8", "169.254.0.0/16")


def _in_cidrs(col: Column, cidrs) -> Column:
    n = ip4_to_long(col)
    out = F.lit(False)
    for c in cidrs:
        lo, hi = _cidr_bounds(c)
        out = out | n.between(F.lit(lo), F.lit(hi))
    return out


_I64_MIN = -(1 << 63)


def _int128_pair(n: int) -> tuple:
    """128-bit int → (hi, lo) signed-int64 BIT PATTERNS (two's
    complement). Bitwise ops work directly; ordered compares go through
    the sign-flip XOR (see ``_unsigned``)."""
    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x
    return signed(n >> 64), signed(n & ((1 << 64) - 1))


def _parse_ip_128(s: str) -> int:
    """Driver-side: any textual IP → 128-bit integer, IPv4 embedded at
    the IPv4-mapped offset (::ffff:a.b.c.d) so v4 and v6 share one
    ordered space — the same normalization Go's net.ParseIP applies by
    always returning 16-byte addresses."""
    import ipaddress
    ip = ipaddress.ip_address(s.strip())
    if ip.version == 4:
        return 0xFFFF00000000 + int(ip)
    return int(ip)


def ip_to_pair(col: Column) -> Column:
    """Any textual IP → ``struct<hi:bigint, lo:bigint>`` (128-bit value
    split into signed-int64 bit patterns; NULL on parse failure). One
    Arrow-batched kernel (stdlib ``ipaddress`` handles every compressed /
    IPv4-embedded form exactly — the 16-byte analog of Go netip); the
    comparisons/bitmasks downstream stay JVM-side."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    schema = T.StructType([T.StructField("hi", T.LongType()),
                           T.StructField("lo", T.LongType())])

    def _pair(batch):  # Series -> DataFrame (struct rows)
        his, los = [], []
        for s in batch:
            try:
                hi, lo = _int128_pair(_parse_ip_128(s))
            except (ValueError, AttributeError):
                hi = lo = None
            his.append(hi)
            los.append(lo)
        # nullable Int64: a plain DataFrame would coerce a None-bearing
        # column to float64, silently corrupting values >= 2^53 (caught
        # by the hypothesis pair-vs-ipaddress property test)
        return pd.DataFrame({"hi": pd.array(his, dtype="Int64"),
                             "lo": pd.array(los, dtype="Int64")})

    return pandas_udf(_pair, schema)(col)


def _unsigned(c: Column) -> Column:
    """Sign-flip so signed int64 compares in unsigned bit order."""
    return c.bitwiseXOR(F.lit(_I64_MIN))


def _pair_between(pair: Column, lo: tuple, hi: tuple) -> Column:
    def ge(p, b):
        return (_unsigned(p["hi"]) > _unsigned(F.lit(b[0]))) | (
            (p["hi"] == F.lit(b[0]))
            & (_unsigned(p["lo"]) >= _unsigned(F.lit(b[1]))))

    def le(p, b):
        return (_unsigned(p["hi"]) < _unsigned(F.lit(b[0]))) | (
            (p["hi"] == F.lit(b[0]))
            & (_unsigned(p["lo"]) <= _unsigned(F.lit(b[1]))))

    return pair["hi"].isNotNull() & ge(pair, lo) & le(pair, hi)


def _pair_masked_eq(pair: Column, net: tuple, mask: tuple) -> Column:
    """(ip & mask) == (network & mask) — byte-wise Contains, the Go
    net.IPNet.Contains semantics (works for non-contiguous masks too)."""
    net_hi, net_lo = net[0] & mask[0], net[1] & mask[1]
    return (pair["hi"].isNotNull()
            & (pair["hi"].bitwiseAND(F.lit(mask[0])) == F.lit(net_hi))
            & (pair["lo"].bitwiseAND(F.lit(mask[1])) == F.lit(net_lo)))


def _cidr_pair_bounds(cidr: str) -> tuple:
    """v6 (or v4-embedded) CIDR → ((lo_hi, lo_lo), (hi_hi, hi_lo))."""
    ip, bits = cidr.split("/")
    bits = int(bits)
    base = _parse_ip_128(ip)
    if ":" not in cidr:
        bits += 96  # v4 prefix length inside the mapped /96
    keep = ((1 << 128) - 1) ^ ((1 << (128 - bits)) - 1)
    lo = base & keep
    hi = lo | ((1 << (128 - bits)) - 1)
    return _int128_pair(lo), _int128_pair(hi)


def _private_v6(col: Column) -> Column:
    lc = F.lower(col)
    return (lc.startswith("fc") | lc.startswith("fd")      # fc00::/7
            | lc.startswith("fe8") | lc.startswith("fe9")  # fe80::/10
            | lc.startswith("fea") | lc.startswith("feb")
            | (lc == "::1"))


@dataclass(frozen=True)
class IPRuleSet(StringRuleSet):
    """IP address validation. Version allow-lists are cumulative
    (reference rule_ip_version.go:59-121); range/CIDR membership compiles
    to numeric BETWEEN on ip-as-int (rule_ip_range.go:18-93,
    rule_ip_cidr.go:17-67); public/private classification follows
    RFC1918/4193/link-local/loopback (rule_ip_public_private.go:12-99)."""

    def _structural(self) -> "IPRuleSet":
        return self._with_rule(Rule(
            Code.PATTERN, lambda c: _is_v4(c) | _is_v6(c),
            "invalid IP address format", conflict_key="ip_format"))

    def _versions(self, vers: tuple) -> "IPRuleSet":
        def pred(c: Column) -> Column:
            out = F.lit(False)
            if 4 in vers:
                out = out | _is_v4(c)
            if 6 in vers:
                out = out | _is_v6(c)
            return out
        return self._with_rule(Rule(
            Code.NOTALLOWED, pred,
            f"IP version must be one of {sorted(vers)}",
            conflict_key="ip_version", params={"versions": vers}))

    def with_ipv4(self) -> "IPRuleSet":
        prior = [r for r in self.rules if r.conflict_key == "ip_version"]
        vers = tuple(set((prior[0].params["versions"] if prior else ())) | {4})
        return self._versions(vers)

    def with_ipv6(self) -> "IPRuleSet":
        prior = [r for r in self.rules if r.conflict_key == "ip_version"]
        vers = tuple(set((prior[0].params["versions"] if prior else ())) | {6})
        return self._versions(vers)

    def with_ipv4_only(self) -> "IPRuleSet":
        return self._versions((4,))

    def with_ipv6_only(self) -> "IPRuleSet":
        return self._versions((6,))

    def with_private_only(self) -> "IPRuleSet":
        return self._with_rule(Rule(
            Code.DENIED,
            lambda c: (_is_v4(c) & _in_cidrs(c, _PRIVATE_V4_CIDRS))
            | (_is_v6(c) & _private_v6(c)),
            "IP must be private", conflict_key="ip_pub_priv",
            params={"mode": "private"}))

    def with_public_only(self) -> "IPRuleSet":
        return self._with_rule(Rule(
            Code.DENIED,
            lambda c: (_is_v4(c) & ~_in_cidrs(c, _PRIVATE_V4_CIDRS))
            | (_is_v6(c) & ~_private_v6(c)),
            "IP must be public", conflict_key="ip_pub_priv",
            params={"mode": "public"}))

    def with_range(self, start: str, end: str) -> "IPRuleSet":
        """Numeric range membership, v4 AND v6 (reference
        rule_ip_range.go — Go compares the 16-byte forms, so mixed-version
        ranges work through the IPv4-mapped space). Pure-v4 ranges stay on
        the codegen'd int64 BETWEEN fast path; v6 ranges compare the
        128-bit (hi, lo) pair from one Arrow parse kernel."""
        if ":" not in start and ":" not in end:
            lo = _cidr_bounds(start + "/32")[0]
            hi = _cidr_bounds(end + "/32")[0]
            pred = lambda c: _is_v4(c) & ip4_to_long(c).between(  # noqa: E731
                F.lit(lo), F.lit(hi))
        else:
            lo_p = _int128_pair(_parse_ip_128(start))
            hi_p = _int128_pair(_parse_ip_128(end))
            pred = lambda c: _pair_between(ip_to_pair(c), lo_p, hi_p)  # noqa: E731
        return self._with_rule(Rule(
            Code.RANGE, pred,
            f"IP must be between {start} and {end}",
            conflict_key=None, params={"start": start, "end": end}))

    def with_cidr(self, *cidrs: str) -> "IPRuleSet":
        """CIDR membership, cumulative, v4 AND v6 (reference
        rule_ip_cidr.go). v4 blocks compile to int64 BETWEENs; v6 blocks
        to 128-bit pair BETWEENs fed by one Arrow parse kernel."""
        prior = [r for r in self.rules if r.conflict_key == "ip_cidr"]
        merged = tuple((prior[0].params["cidrs"] if prior else ())) + tuple(cidrs)
        v4 = [c for c in merged if ":" not in c]
        v6 = [c for c in merged if ":" in c]

        def pred(c: Column) -> Column:
            out = F.lit(False)
            if v4:
                out = out | (_is_v4(c) & _in_cidrs(c, v4))
            if v6:
                pair = ip_to_pair(c)
                for cidr in v6:
                    lo_p, hi_p = _cidr_pair_bounds(cidr)
                    out = out | (_is_v6(c) & _pair_between(pair, lo_p, hi_p))
            return out

        return self._with_rule(Rule(
            Code.RANGE, pred,
            f"IP must be within {list(merged)!r}"[:120],
            conflict_key="ip_cidr", params={"cidrs": merged}))

    def with_subnet_mask(self, network: str, mask: str) -> "IPRuleSet":
        """Membership in the network defined by address + subnet mask,
        v4 or v6, including non-contiguous masks (reference
        rule_ip_subnet_mask.go:18-81: ``net.IPNet.Contains`` byte-wise
        AND-compare; any subnet-mask rule replaces a prior one). PATTERN
        on mismatch, matching the reference's error code."""
        import ipaddress
        net_ip = ipaddress.ip_address(network)
        mask_ip = ipaddress.ip_address(mask)
        if (net_ip.version == 4) != (mask_ip.version == 4):
            raise ValueError(
                "network address and subnet mask must be the same version")
        if net_ip.version == 4:
            net_l = int(net_ip)
            mask_l = int(mask_ip)
            pred = lambda c: _is_v4(c) & (  # noqa: E731
                ip4_to_long(c).bitwiseAND(F.lit(mask_l))
                == F.lit(net_l & mask_l))
        else:
            net_p = _int128_pair(int(net_ip))
            mask_p = _int128_pair(int(mask_ip))
            pred = lambda c: _pair_masked_eq(ip_to_pair(c), net_p, mask_p)  # noqa: E731
        return self._with_rule(Rule(
            Code.PATTERN, pred,
            "IP address is not within the specified network",
            conflict_key="ip_subnet_mask",
            params={"network": network, "mask": mask}))


def IP() -> IPRuleSet:
    return IPRuleSet()._structural()


# ---------------------------------------------------------------------------
# URI (reference net/uri.go:140-148,626-668) + Query (net/query.go)
# ---------------------------------------------------------------------------

# RFC 3986 appendix-B decomposition regex (the same structure the
# reference builds part-wise at net/uri.go:627-634)
_URI_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"
_BAD_PCT = "%(?![0-9A-Fa-f]{2})"

def uri_part(col: Column, part: str) -> Column:
    """Extract a URI component (scheme/authority/path/query/fragment/
    host/port/userinfo) via the RFC 3986 regex — NULL-free: empty string
    when absent."""
    idx = {"scheme": 2, "authority": 4, "path": 5, "query": 7,
           "fragment": 9}
    if part in idx:
        return F.regexp_extract(col, _URI_RE, idx[part])
    auth = F.regexp_extract(col, _URI_RE, 4)
    if part == "userinfo":
        return F.when(F.instr(auth, "@") > 0,
                      F.substring_index(auth, "@", 1)).otherwise(F.lit(""))
    hostport = F.when(F.instr(auth, "@") > 0,
                      F.substring_index(auth, "@", -1)).otherwise(auth)
    if part == "host":
        return F.substring_index(hostport, ":", 1)
    if part == "port":
        return F.when(F.instr(hostport, ":") > 0,
                      F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    raise ValueError(f"unknown URI part {part!r}")


@dataclass(frozen=True)
class URIRuleSet(StringRuleSet):
    """URI validation by RFC 3986 decomposition; each part constrained by
    its own predicates (reference part rule sets, net/uri.go:58-70)."""

    deep_errors: bool = False

    def with_deep_errors(self) -> "URIRuleSet":
        """Violation paths gain the failing URI part's name — e.g.
        ``/myobj/some_uri/port`` instead of ``/myobj/some_uri`` (reference
        WithDeepErrors, net/uri.go:262-279; part names scheme/user/
        password/host/port/path/query/fragment, uri.go:352-593)."""
        return self._clone(deep_errors=True)

    def _rule_entries(self, value: Column, field_path: str):
        if not self.deep_errors:
            return super()._rule_entries(value, field_path)
        entries = []
        for r in self.rules:
            part = r.params.get("uri_part")
            fp = f"{field_path}/{part}" if part else field_path
            entries.append(F.when(
                ~F.coalesce(r.predicate(value), F.lit(False)),
                violation_struct(fp, self.err_code or r.rule_id,
                                 self.err_message or r.message, value)))
        return entries

    def _structural(self, relative: bool = False) -> "URIRuleSet":
        out = self._with_rule(Rule(
            Code.ENCODING, lambda c: ~c.rlike(_BAD_PCT),
            "invalid percent encoding", conflict_key="uri_encoding"))
        if not relative:
            out = out._with_rule(Rule(
                Code.PATTERN,
                lambda c: uri_part(c, "scheme").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*$"),
                "missing or invalid scheme", conflict_key="uri_scheme_req",
                params={"uri_part": "scheme"}))
        return out

    def with_relative(self) -> "URIRuleSet":
        """Allow scheme-less URIs (reference WithRelative,
        net/uri.go:290-299)."""
        out = self._clone(rules=tuple(
            r for r in self.rules if r.conflict_key != "uri_scheme_req"))
        return out._with_rule(Rule(
            Code.PATTERN,
            lambda c: (uri_part(c, "scheme") == "")
            | uri_part(c, "scheme").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*$"),
            "invalid scheme", conflict_key="uri_scheme_req",
            params={"uri_part": "scheme", "relative": True}))

    def with_allowed_schemes(self, *schemes: str) -> "URIRuleSet":
        allowed = tuple(sorted({s.lower() for s in schemes}))
        return self._with_rule(Rule(
            Code.NOTALLOWED,
            lambda c: F.lower(uri_part(c, "scheme")).isin(*allowed),
            f"scheme must be one of {list(allowed)!r}"[:120],
            conflict_key="uri_schemes",
            params={"schemes": allowed, "uri_part": "scheme"}))

    def _part_required(self, part: str) -> "URIRuleSet":
        return self._with_rule(Rule(
            Code.REQUIRED, lambda c, p=part: uri_part(c, p) != "",
            f"URI {part} is required", conflict_key=f"uri_req_{part}",
            params={"uri_part": part}))

    def with_host_required(self) -> "URIRuleSet":
        return self._part_required("host")

    def with_port_required(self) -> "URIRuleSet":
        return self._part_required("port")

    def with_fragment_required(self) -> "URIRuleSet":
        return self._part_required("fragment")

    def with_user_required(self) -> "URIRuleSet":
        return self._with_rule(Rule(
            Code.REQUIRED,
            lambda c: F.substring_index(uri_part(c, "userinfo"), ":", 1) != "",
            "URI user is required", conflict_key="uri_req_user",
            params={"uri_part": "user"}))

    def with_password_required(self) -> "URIRuleSet":
        return self._with_rule(Rule(
            Code.REQUIRED,
            lambda c: F.instr(uri_part(c, "userinfo"), ":") > 0,
            "URI password is required", conflict_key="uri_req_password",
            params={"uri_part": "password"}))

    def _port_num(self, col: Column) -> Column:
        return uri_part(col, "port").try_cast("int")

    def with_min_port(self, n: int) -> "URIRuleSet":
        return self._with_rule(Rule(
            Code.MIN,
            lambda c: self._port_num(c).isNull() | (self._port_num(c) >= n),
            f"port must be at least {n}", conflict_key="uri_min_port",
            params={"uri_part": "port", "n": n}))

    def with_max_port(self, n: int) -> "URIRuleSet":
        return self._with_rule(Rule(
            Code.MAX,
            lambda c: self._port_num(c).isNull() | (self._port_num(c) <= n),
            f"port must be at most {n}", conflict_key="uri_max_port",
            params={"uri_part": "port", "n": n}))

    def with_allowed_ports(self, *ports: int) -> "URIRuleSet":
        allowed = tuple(sorted(set(ports)))
        return self._with_rule(Rule(
            Code.NOTALLOWED,
            lambda c: self._port_num(c).isNull()
            | self._port_num(c).isin(*allowed),
            f"port must be one of {list(allowed)!r}",
            conflict_key="uri_ports",
            params={"ports": allowed, "uri_part": "port"}))

    def with_query_param(self, name: str, rs: RuleSet) -> "URIRuleSet":
        """Constrain one query parameter's (first) value (reference
        WithQueryParam, net/uri.go:225-232). The param value is extracted
        JVM-side; the sub-rule-set's predicates are lifted, gated on
        param presence."""
        import re as _re
        pat = rf"(?:^|&){_re.escape(name)}=([^&]*)"
        cast_t = rs.SPARK_TYPE if rs.SPARK_TYPE != "string" else None
        out = self
        for i, r in enumerate(rs.rules):
            def pred(c, p=r.predicate, q=pat, t=cast_t):
                raw = F.regexp_extract(uri_part(c, "query"), q, 1)
                v = raw.try_cast(t) if t else raw
                return (raw == "") | p(v)
            out = out._with_rule(Rule(
                r.rule_id, pred,
                f"query param {name!r}: {r.message}",
                conflict_key=f"uri_qp_{name}_{i}_{r.conflict_key}",
                params={**r.params, "uri_part": "query"}))
        if rs.required:
            out = out._with_rule(Rule(
                Code.REQUIRED,
                lambda c: uri_part(c, "query").rlike(pat.replace("([^&]*)", "")),
                f"query param {name!r} is required",
                conflict_key=f"uri_qp_{name}_required",
                params={"uri_part": "query"}))
        return out


def URI() -> URIRuleSet:
    return URIRuleSet()._structural()


@dataclass(frozen=True)
class QueryRuleSet(StringRuleSet):
    """Standalone query-string validation (reference net/query.go:44-48):
    percent-encoding + per-parameter rule sets."""

    def _structural(self) -> "QueryRuleSet":
        return self._with_rule(Rule(
            Code.ENCODING, lambda c: ~c.rlike(_BAD_PCT),
            "invalid percent encoding", conflict_key="q_encoding"))

    def with_param(self, name: str, rs: RuleSet) -> "QueryRuleSet":
        import re as _re
        pat = rf"(?:^|&){_re.escape(name)}=([^&]*)"
        cast_t = rs.SPARK_TYPE if rs.SPARK_TYPE != "string" else None
        out = self
        for i, r in enumerate(rs.rules):
            def pred(c, p=r.predicate, q=pat, t=cast_t):
                raw = F.regexp_extract(c, q, 1)
                v = raw.try_cast(t) if t else raw
                return (raw == "") | p(v)
            out = out._with_rule(Rule(
                r.rule_id, pred,
                f"query param {name!r}: {r.message}",
                conflict_key=f"q_{name}_{i}_{r.conflict_key}", params=r.params))
        if rs.required:
            out = out._with_rule(Rule(
                Code.REQUIRED, lambda c: c.rlike(pat.replace("([^&]*)", "")),
                f"query param {name!r} is required",
                conflict_key=f"q_{name}_required"))
        return out


def Query() -> QueryRuleSet:
    return QueryRuleSet()._structural()
