"""robots.txt parser tests — ported 1:1 from
/root/reference/spider/src/packages/robotparser/parser.rs:670-973."""

from spider_ray.robots import Entry, RobotFileParser, RuleLine, extract_path


def parsed(lines):
    p = RobotFileParser()
    p.modified()
    p.parse(lines)
    return p


# parser.rs:674-702
def test_extract_path():
    assert extract_path("https://example.com/foo/bar") == "/foo/bar"
    assert extract_path("https://example.com/foo?q=1") == "/foo"
    assert extract_path("https://example.com") == "/"
    assert extract_path("") == "/"
    assert extract_path("http://example.com/page") == "/page"
    assert extract_path("example.com/page") == "/page"


# parser.rs:704-737
def test_rule_line_wildcard():
    rule = RuleLine("*", False)
    assert rule.applies_to("/anything")
    assert rule.applies_to("/foo/bar")


def test_rule_line_prefix():
    rule = RuleLine("/foo*", False)
    assert rule.applies_to("/foobar")
    assert rule.applies_to("/foo/baz")
    assert not rule.applies_to("/bar")


def test_rule_line_exact():
    rule = RuleLine("/exact", False)
    assert rule.applies_to("/exact")
    assert not rule.applies_to("/exact/more")
    assert not rule.applies_to("/other")


def test_rule_line_directory():
    rule = RuleLine("/dir/", False)
    assert rule.applies_to("/dir/page")
    assert rule.applies_to("/dir/sub/page")
    assert not rule.applies_to("/other/")


# parser.rs:739-754
def test_entry_applies_to_agent():
    e = Entry(useragents=["googlebot"])
    assert e.applies_to("Googlebot")
    assert e.applies_to("Googlebot/2.1")
    assert not e.applies_to("Bingbot")


def test_entry_wildcard_agent():
    e = Entry(useragents=["*"])
    assert e.applies_to("Googlebot")
    assert e.applies_to("AnyAgent")


# parser.rs:756-767
def test_entry_allowance():
    e = Entry(useragents=["*"])
    e.rulelines = [RuleLine("/private", False), RuleLine("/public", True)]
    assert not e.allowance("/private")
    assert e.allowance("/public")
    assert e.allowance("/other")


# parser.rs:769-777
def test_parser_basic():
    p = parsed(["User-agent: *", "Disallow: /private", "Allow: /public"])
    assert p.can_fetch("Googlebot", "https://example.com/public")
    assert not p.can_fetch("Googlebot", "https://example.com/private")


# parser.rs:779-794
def test_parser_multiple_agents():
    p = parsed(["User-agent: googlebot", "Disallow: /nogoogle", "", "User-agent: bingbot", "Disallow: /nobing"])
    assert p.entries


# parser.rs:796-807
def test_parser_crawl_delay():
    p = parsed(["User-agent: testbot", "Crawl-delay: 5", "Disallow: /test"])
    assert p.entries
    assert p.entries[0].crawl_delay == 5.0
    assert p.get_crawl_delay("TestBot/9") == 5.0


# parser.rs:809-825
def test_parser_request_rate():
    p = parsed(["User-agent: testbot", "Request-rate: 3/60", "Disallow: /test"])
    assert p.get_req_rate("testbot") == (3, 60)


# parser.rs:827-841
def test_disallow_all_allow_all():
    p = RobotFileParser()
    p.modified()
    p.disallow_all = True
    assert not p.can_fetch("*", "https://example.com/any")
    p2 = RobotFileParser()
    p2.modified()
    p2.allow_all = True
    assert p2.can_fetch("*", "https://example.com/any")


# parser.rs:843-856
def test_parser_comments():
    p = parsed(["# This is a comment", "User-agent: * # all bots", "Disallow: /secret # hidden area"])
    assert p.default_entry.has_useragent()
    assert not p.can_fetch("anybot", "https://example.com/secret")


# parser.rs:858-863
def test_empty_disallow_allows():
    assert RuleLine("", False).allowance


# parser.rs:865-879
def test_case_insensitive_agent():
    p = parsed(["User-agent: googlebot", "Disallow: /private"])
    assert not p.entry_allowed("GoogleBot", "/private")
    assert not p.entry_allowed("googlebot", "/private")
    assert not p.entry_allowed("GOOGLEBOT", "/private")
    assert p.entry_allowed("GoogleBot", "/public")


# parser.rs:881-892
def test_version_stripped():
    p = parsed(["User-agent: googlebot", "Disallow: /secret"])
    assert not p.entry_allowed("Googlebot/2.1", "/secret")
    assert p.entry_allowed("Googlebot/2.1", "/public")


# parser.rs:894-925
def test_multiple_entries():
    p = parsed(
        [
            "User-agent: googlebot",
            "Disallow: /nogoogle",
            "",
            "User-agent: bingbot",
            "Disallow: /nobing",
            "",
            "User-agent: duckduckbot",
            "Disallow: /noduck",
        ]
    )
    assert len(p.entries) == 3
    assert not p.entry_allowed("Googlebot", "/nogoogle")
    assert p.entry_allowed("Googlebot", "/public")
    assert not p.entry_allowed("Bingbot", "/nobing")
    assert p.entry_allowed("Bingbot", "/public")
    assert not p.entry_allowed("DuckDuckBot", "/noduck")
    assert p.entry_allowed("DuckDuckBot", "/public")
    assert p.entry_allowed("Googlebot", "/nobing")


# parser.rs:927-941
def test_get_crawl_delay_case_insensitive():
    p = parsed(["User-agent: slowbot", "Crawl-delay: 10", "Disallow: /test"])
    assert p.get_crawl_delay("SlowBot/1.0") == 10.0
    assert p.get_crawl_delay("SLOWBOT") == 10.0


# parser.rs:943-972
def test_get_req_rate_agent_match():
    p = parsed(
        [
            "User-agent: fastbot",
            "Request-rate: 5/30",
            "Disallow: /test",
            "",
            "User-agent: slowbot",
            "Request-rate: 1/60",
            "Disallow: /test",
        ]
    )
    assert p.get_req_rate("FastBot/2.0") == (5, 30)
    assert p.get_req_rate("SLOWBOT") == (1, 60)
    assert p.get_req_rate("unknownbot") is None


def test_unread_parser_denies():
    p = RobotFileParser()  # last_checked == 0 → deny (parser.rs:571-580)
    assert not p.can_fetch("*", "https://example.com/x")


def test_status_handling():
    p = RobotFileParser()
    p.read_status(403, None)
    assert p.disallow_all
    p2 = RobotFileParser()
    p2.read_status(404, None)
    assert p2.allow_all
    p3 = RobotFileParser()
    p3.read_status(200, "User-agent: *\nDisallow: /x")
    assert not p3.can_fetch("bot", "https://e.com/x")
    assert p3.can_fetch("bot", "https://e.com/y")


def test_roundtrip_serialization():
    p = parsed(["User-agent: *", "Disallow: /private", "Allow: /public", "Crawl-delay: 2"])
    q = RobotFileParser.from_dict(p.to_dict())
    for path in ("/private", "/public", "/other"):
        assert q.can_fetch("bot", f"https://e.com{path}") == p.can_fetch("bot", f"https://e.com{path}")
    assert q.get_crawl_delay("bot") == p.get_crawl_delay("bot")
