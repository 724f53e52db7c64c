"""net-package rules (SURVEY.md §2.7; reference /root/reference/pkg/rules/net/):
Email / Domain / IP / URI / Query — MustApply/MustNotApply-style per rule."""

from pyspark.sql import functions as F

from protovalidate_spark import IP, URI, Code, Domain, Email, Int32, Query, String


def codes_for(spark, rs, value):
    df = spark.createDataFrame([(value,)], "v string")
    out = df.select(F.explode(
        rs.compile_violations(F.col("v"), "/v", "string")).alias("e"))
    return sorted(r["e"]["rule_id"] for r in out.collect())


# ---- Domain ----------------------------------------------------------------

def test_domain_valid(spark):
    assert codes_for(spark, Domain(), "example.com") == []
    assert codes_for(spark, Domain(), "a-b.x9.co") == []


def test_domain_bad_label(spark):
    # empty label (double dot) / leading dash — net/domain.go:21 label rule
    assert Code.PATTERN in codes_for(spark, Domain(), "bad..domain.com")
    assert Code.PATTERN in codes_for(spark, Domain(), "-bad.com")
    assert Code.PATTERN in codes_for(spark, Domain(), "bad-.com")


def test_domain_too_long(spark):
    long = ".".join(["a" * 60] * 5)  # > 253 chars
    assert Code.MAX_LEN in codes_for(spark, Domain(), long)


def test_domain_tld(spark):
    rs = Domain().with_tld()
    assert codes_for(spark, rs, "example.com") == []
    assert Code.NOTALLOWED in codes_for(spark, rs, "example.notatld")
    rs2 = Domain().with_tld("test")
    assert codes_for(spark, rs2, "example.test") == []
    assert Code.NOTALLOWED in codes_for(spark, rs2, "example.com")


def test_domain_suffix_label_aligned(spark):
    # label-aligned: evil-example.com does NOT match suffix example.com
    rs = Domain().with_suffix("example.com")
    assert codes_for(spark, rs, "example.com") == []
    assert codes_for(spark, rs, "a.example.com") == []
    assert Code.NOTALLOWED in codes_for(spark, rs, "evil-example.com")


def test_domain_suffix_cumulative(spark):
    rs = Domain().with_suffix("example.com").with_suffix("example.org")
    assert codes_for(spark, rs, "a.example.org") == []


# ---- Email -----------------------------------------------------------------

def test_email_valid(spark):
    assert codes_for(spark, Email(), "user@example.com") == []
    assert codes_for(spark, Email(), "u.ser+tag@mail.example.org") == []


def test_email_at_symbol(spark):
    # net/email.go:177-181: missing @ / too many @
    assert Code.PATTERN in codes_for(spark, Email(), "userexample.com")
    assert Code.PATTERN in codes_for(spark, Email(), "a@b@example.com")


def test_email_local_part(spark):
    # net/email.go:200-213: empty, leading/trailing dot, double dot
    assert Code.PATTERN in codes_for(spark, Email(), "@example.com")
    assert Code.PATTERN in codes_for(spark, Email(), ".user@example.com")
    assert Code.PATTERN in codes_for(spark, Email(), "user.@example.com")
    assert Code.PATTERN in codes_for(spark, Email(), "us..er@example.com")


def test_email_domain_rules(spark):
    assert Code.PATTERN in codes_for(spark, Email(), "user@bad..domain.com")
    assert Code.NOTALLOWED in codes_for(spark, Email(), "user@example.notatld")


def test_email_custom_domain(spark):
    # WithDomain replaces the default (net/email.go:255-260)
    rs = Email().with_domain(Domain().with_suffix("corp.example.com"))
    assert codes_for(spark, rs, "u@mail.corp.example.com") == []
    assert Code.NOTALLOWED in codes_for(spark, rs, "u@other.com")


# ---- IP --------------------------------------------------------------------

def test_ip_v4(spark):
    assert codes_for(spark, IP(), "192.168.1.1") == []
    assert codes_for(spark, IP(), "255.255.255.255") == []
    assert Code.PATTERN in codes_for(spark, IP(), "256.1.1.1")
    assert Code.PATTERN in codes_for(spark, IP(), "1.2.3")
    assert Code.PATTERN in codes_for(spark, IP(), "01.2.3.4")


def test_ip_v6(spark):
    assert codes_for(spark, IP(), "2001:db8::1") == []
    assert codes_for(spark, IP(), "::1") == []
    assert codes_for(spark, IP(), "fe80:0:0:0:0:0:0:1") == []
    assert Code.PATTERN in codes_for(spark, IP(), "2001:db8:::1")
    assert Code.PATTERN in codes_for(spark, IP(), "12345::1")


def test_ip_version_only(spark):
    assert codes_for(spark, IP().with_ipv4_only(), "1.2.3.4") == []
    assert Code.NOTALLOWED in codes_for(spark, IP().with_ipv4_only(), "::1")
    assert codes_for(spark, IP().with_ipv6_only(), "::1") == []
    assert Code.NOTALLOWED in codes_for(spark, IP().with_ipv6_only(), "1.2.3.4")


def test_ip_version_cumulative(spark):
    # with_ipv4().with_ipv6() allows both (rule_ip_version.go:59-121)
    rs = IP().with_ipv4().with_ipv6()
    assert codes_for(spark, rs, "1.2.3.4") == []
    assert codes_for(spark, rs, "::1") == []


def test_ip_private_public(spark):
    assert codes_for(spark, IP().with_private_only(), "10.1.2.3") == []
    assert codes_for(spark, IP().with_private_only(), "192.168.0.9") == []
    assert Code.DENIED in codes_for(spark, IP().with_private_only(), "8.8.8.8")
    assert codes_for(spark, IP().with_public_only(), "8.8.8.8") == []
    assert Code.DENIED in codes_for(spark, IP().with_public_only(), "172.16.0.1")


def test_ip_cidr_and_range(spark):
    rs = IP().with_cidr("10.0.0.0/8")
    assert codes_for(spark, rs, "10.200.3.4") == []
    assert Code.RANGE in codes_for(spark, rs, "11.0.0.1")
    rs2 = IP().with_range("192.168.1.10", "192.168.1.20")
    assert codes_for(spark, rs2, "192.168.1.15") == []
    assert Code.RANGE in codes_for(spark, rs2, "192.168.1.21")


# ---- URI -------------------------------------------------------------------

def test_uri_valid(spark):
    assert codes_for(spark, URI(), "https://example.com/path?q=1#frag") == []


def test_uri_scheme(spark):
    assert Code.PATTERN in codes_for(spark, URI(), "//example.com/x")
    assert codes_for(spark, URI().with_relative(), "//example.com/x") == []
    rs = URI().with_allowed_schemes("https")
    assert codes_for(spark, rs, "https://e.com") == []
    assert Code.NOTALLOWED in codes_for(spark, rs, "ftp://e.com")


def test_uri_parts_required(spark):
    rs = URI().with_host_required().with_port_required()
    assert codes_for(spark, rs, "https://e.com:8080/x") == []
    got = codes_for(spark, rs, "https:///x")
    assert got.count(Code.REQUIRED) == 2  # host + port both missing
    rs2 = URI().with_user_required().with_password_required()
    assert codes_for(spark, rs2, "ftp://u:pw@e.com/") == []
    assert Code.REQUIRED in codes_for(spark, rs2, "ftp://e.com/")


def test_uri_port_bounds(spark):
    rs = URI().with_min_port(1024).with_max_port(49151)
    assert codes_for(spark, rs, "https://e.com:8080") == []
    assert Code.MIN in codes_for(spark, rs, "https://e.com:80")
    assert Code.MAX in codes_for(spark, rs, "https://e.com:65000")
    rs2 = URI().with_allowed_ports(443, 8443)
    assert Code.NOTALLOWED in codes_for(spark, rs2, "https://e.com:8080")


def test_uri_percent_encoding(spark):
    # net/uri.go:38-55: every % must be followed by 2 hex digits
    assert codes_for(spark, URI(), "https://e.com/a%20b") == []
    assert Code.ENCODING in codes_for(spark, URI(), "https://e.com/a%2gb")


def test_uri_query_param(spark):
    rs = URI().with_query_param("page", Int32().min(1).max(100))
    assert codes_for(spark, rs, "https://e.com/?page=5") == []
    assert Code.MAX in codes_for(spark, rs, "https://e.com/?page=500")
    # absent param passes (not required)
    assert codes_for(spark, rs, "https://e.com/") == []


def test_query_standalone(spark):
    rs = Query().with_param("tok", String().min_len(3))
    assert codes_for(spark, rs, "a=1&tok=abcd") == []
    assert Code.MIN_LEN in codes_for(spark, rs, "a=1&tok=ab")
    assert Code.ENCODING in codes_for(spark, rs, "a=%zz")
    rs2 = Query().with_param("tok", String().with_required())
    assert Code.REQUIRED in codes_for(spark, rs2, "a=1")


# ---- IPv6 ranges / CIDR / subnet mask (round-2 additions) ------------------

def test_ipv4_mapped_v6_is_structurally_valid(spark):
    from protovalidate_spark import IP
    rs = IP()
    assert codes_for(spark, rs, "::ffff:192.0.2.1") == []
    assert codes_for(spark, rs, "64:ff9b::1.2.3.4") == []
    assert codes_for(spark, rs, "::ffff:999.0.2.1") == ["PATTERN"]


def test_ipv6_v4_tail_group_count_bounded(spark):
    """Compressed v6 with a dotted-quad tail must total <=8 groups —
    Go netip and Python ipaddress both reject 9+-group forms (round-2
    ADVICE: the old regex had an unbounded ({H}:)* here)."""
    from protovalidate_spark import IP
    rs = IP()
    # over-long: 9 and 11 expressed groups
    assert codes_for(spark, rs, "1::2:3:4:5:6:7:1.2.3.4") == ["PATTERN"]
    assert codes_for(spark, rs, "1:2:3:4:5::6:7:8:9:1.2.3.4") == ["PATTERN"]
    # boundary-valid: '::' standing for exactly one zero group (8 total)
    assert codes_for(spark, rs, "1::2:3:4:5:1.2.3.4") == []
    assert codes_for(spark, rs, "1:2:3:4:5::1.2.3.4") == []
    assert codes_for(spark, rs, "::6:5:4:3:2:1.2.3.4") == []
    assert codes_for(spark, rs, "1:2:3:4:5:6:1.2.3.4") == []  # full form


def test_ip_cidr_v6(spark):
    from protovalidate_spark import IP
    rs = IP().with_cidr("2001:db8::/32", "10.0.0.0/8")
    assert codes_for(spark, rs, "2001:db8::1") == []
    assert codes_for(spark, rs, "2001:db9::1") == ["RANGE"]
    assert codes_for(spark, rs, "10.1.2.3") == []       # v4 block still works
    assert codes_for(spark, rs, "11.1.2.3") == ["RANGE"]


def test_ip_range_v6(spark):
    from protovalidate_spark import IP
    rs = IP().with_range("2001:db8::1", "2001:db8::ff")
    assert codes_for(spark, rs, "2001:db8::a") == []
    assert codes_for(spark, rs, "2001:db8::1ff") == ["RANGE"]


def test_ip_subnet_mask_v4_and_v6(spark):
    from protovalidate_spark import IP
    v4 = IP().with_subnet_mask("192.168.1.0", "255.255.255.0")
    assert codes_for(spark, v4, "192.168.1.42") == []
    assert codes_for(spark, v4, "192.168.2.42") == ["PATTERN"]
    v6 = IP().with_subnet_mask("2001:db8::", "ffff:ffff:ffff:ffff::")
    assert codes_for(spark, v6, "2001:db8::5") == []
    assert codes_for(spark, v6, "2001:db9::5") == ["PATTERN"]
    # replaces a prior subnet-mask rule (reference Replaces semantics)
    both = v4.with_subnet_mask("10.0.0.0", "255.0.0.0")
    assert codes_for(spark, both, "10.9.9.9") == []


def test_ip_subnet_mask_version_mismatch():
    from protovalidate_spark import IP
    import pytest as _pytest
    with _pytest.raises(ValueError):
        IP().with_subnet_mask("192.168.1.0", "ffff::")


def test_tld_list_is_full_iana(spark):
    from protovalidate_spark import Domain
    from protovalidate_spark.rules.tlds import IANA_TLDS
    assert len(IANA_TLDS) > 1400
    rs = Domain().with_tld()
    assert codes_for(spark, rs, "studio.photography") == []
    assert codes_for(spark, rs, "example.notatld") == ["NOTALLOWED"]


def test_domain_punycode_normalization(spark):
    from protovalidate_spark import Domain
    rs = Domain().with_punycode().with_tld()
    assert codes_for(spark, rs, "bücher.de") == []
    assert codes_for(spark, rs, "пример.рф") == []  # IDN TLD (xn--p1ai)
    # without normalization the same input fails the ASCII label regex
    plain = Domain().with_tld()
    assert Code.PATTERN in codes_for(spark, plain, "bücher.de")
