"""robots.txt parser matching the reference semantics.

Re-expresses ``spider/src/packages/robotparser/parser.rs`` (non-regex build):

* first matching ruleline wins, default allow    — ``parser.rs:196-203``
* ruleline path matching (wildcard / directory / star-suffix / exact)
                                                 — ``parser.rs:132-145``
* UA matching: lowercase, version-stripped, substring — ``parser.rs:167-185``
* first ``User-agent: *`` entry becomes the default entry — ``parser.rs:382-392``
* 401/403 → disallow_all; other 4xx → allow_all  — ``parser.rs:355-364``
* crawl-delay / request-rate parsing             — ``parser.rs:484-512``
* ``extract_path`` strips scheme+host and query  — ``parser.rs:253-280``
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import unquote


@dataclass
class RuleLine:
    path: str
    allowance: bool

    def __post_init__(self):
        # parser.rs:120-129: empty-path Disallow means allow-everything.
        if self.path == "" and not self.allowance:
            self.allowance = True

    def applies_to(self, pathname: str) -> bool:
        p = self.path
        if p == "*" or (p == "/" and pathname == "/") or (p.endswith("/") and pathname.startswith(p)):
            return True
        if p.endswith("*") and pathname.startswith(p[:-1]):
            return True
        return pathname == p


@dataclass
class Entry:
    useragents: list[str] = field(default_factory=list)
    rulelines: list[RuleLine] = field(default_factory=list)
    crawl_delay: float | None = None  # seconds
    req_rate: tuple[int, int] | None = None  # (requests, seconds)

    @staticmethod
    def prepare_useragent(useragent: str) -> str:
        return useragent.split("/", 1)[0].lower()

    def applies_to_prepared(self, ua_lower: str) -> bool:
        return any(agent == "*" or agent in ua_lower for agent in self.useragents)

    def applies_to(self, useragent: str) -> bool:
        return self.applies_to_prepared(self.prepare_useragent(useragent))

    def allowance(self, filename: str) -> bool:
        for line in self.rulelines:
            if line.applies_to(filename):
                return line.allowance
        return True

    def has_useragent(self) -> bool:
        return any(a == "*" for a in self.useragents)

    def is_empty(self) -> bool:
        return not self.useragents and not self.rulelines


def extract_path(url: str) -> str:
    """``extract_path`` (``parser.rs:253-280``)."""
    if not url:
        return "/"
    if url.startswith("https://"):
        prefix = 8
    elif url.startswith("http://"):
        prefix = 7
    else:
        prefix = 0
    slash = url.find("/", prefix)
    if slash == -1:
        return "/"
    q = url.find("?", slash)
    return url[slash:q] if q != -1 else url[slash:]


class RobotFileParser:
    """Pure-Python ``RobotFileParser`` with identical decision semantics."""

    def __init__(self) -> None:
        self.entries: list[Entry] = []
        self.default_entry = Entry()
        self.disallow_all = False
        self.allow_all = False
        self.last_checked = 0

    def modified(self) -> None:
        # The reference stamps wall-clock; any nonzero value means "read".
        self.last_checked = 1

    # -- ingestion ----------------------------------------------------------

    def read_status(self, status_code: int, body: str | None) -> None:
        """Fold a fetched robots.txt (status, body) — ``parser.rs:341-368``."""
        self.modified()
        if status_code in (401, 403):
            self.disallow_all = True
        elif 400 <= status_code < 500:
            self.allow_all = True
        elif status_code == 200 and body is not None:
            self.parse_str(body)

    def parse_str(self, text: str) -> None:
        if text:
            self.parse(text.split("\n"))

    def parse(self, lines) -> None:
        """State-machine parse — ``parser.rs:420-522``."""
        state = 0
        entry = Entry()
        for raw in lines:
            ln = raw
            if ln == "":
                if state == 1:
                    entry = Entry()
                    state = 0
                elif state == 2:
                    self._add_entry(entry)
                    entry = Entry()
                    state = 0
            hash_pos = ln.find("#")
            if hash_pos != -1:
                ln = ln[:hash_pos]
            ln = ln.strip()
            if not ln:
                continue
            colon = ln.find(":")
            if colon == -1:
                continue
            part0 = ln[:colon].strip()
            part1 = unquote(ln[colon + 1 :].strip())
            key = part0.lower()
            if key == "user-agent":
                if state == 2:
                    self._add_entry(entry)
                    entry = Entry()
                entry.useragents.append(part1.lower())
                state = 1
            elif key == "disallow":
                if state != 0:
                    entry.rulelines.append(RuleLine(part1, False))
                    state = 2
            elif key == "allow":
                if state != 0:
                    entry.rulelines.append(RuleLine(part1, True))
                    state = 2
            elif key == "crawl-delay":
                if state != 0:
                    try:
                        delay = float(part1)
                        if delay >= 0.0 and delay != float("inf"):
                            entry.crawl_delay = delay
                    except ValueError:
                        pass
                    state = 2
            elif key == "sitemap":
                if state != 0:
                    state = 2
            elif key == "request-rate" and state != 0:
                nums = part1.split("/")
                if len(nums) == 2:
                    try:
                        entry.req_rate = (int(nums[0]), int(nums[1]))
                    except ValueError:
                        pass
                state = 2
        if state == 2:
            self._add_entry(entry)

    def _add_entry(self, entry: Entry) -> None:
        if entry.has_useragent():
            if self.default_entry.is_empty():
                self.default_entry = entry
        else:
            self.entries.append(entry)

    # -- decisions ----------------------------------------------------------

    def can_fetch(self, useragent: str, url: str) -> bool:
        """``can_fetch`` (``parser.rs:571-599``)."""
        if self.allow_all:
            return True
        if self.last_checked == 0 or self.disallow_all:
            return False
        url_str = extract_path(url)
        if self.entry_allowed(useragent, url_str):
            return True
        if not self.default_entry.is_empty():
            return self.default_entry.allowance(url_str)
        return True

    def entry_allowed(self, useragent: str, url_str: str) -> bool:
        ua_lower = Entry.prepare_useragent(useragent)
        for entry in self.entries:
            if entry.applies_to_prepared(ua_lower):
                return entry.allowance(url_str)
        return False

    def get_crawl_delay(self, useragent: str | None) -> float | None:
        """Crawl-delay seconds for this UA — ``parser.rs:624-653``."""
        if self.last_checked == 0:
            return None
        if useragent is not None:
            ua_lower = Entry.prepare_useragent(useragent)
            for entry in self.entries:
                if entry.applies_to_prepared(ua_lower):
                    return entry.crawl_delay
        if not self.default_entry.is_empty():
            return self.default_entry.crawl_delay
        return None

    def get_req_rate(self, useragent: str) -> tuple[int, int] | None:
        if self.last_checked == 0:
            return None
        ua_lower = Entry.prepare_useragent(useragent)
        for entry in self.entries:
            if entry.applies_to_prepared(ua_lower):
                return entry.req_rate
        return None

    # -- serialization (for actor checkpoint / broadcast) -------------------

    def to_dict(self) -> dict:
        return {
            "entries": [
                {
                    "useragents": e.useragents,
                    "rulelines": [(r.path, r.allowance) for r in e.rulelines],
                    "crawl_delay": e.crawl_delay,
                    "req_rate": e.req_rate,
                }
                for e in [*self.entries, self.default_entry]
            ],
            "disallow_all": self.disallow_all,
            "allow_all": self.allow_all,
            "last_checked": self.last_checked,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "RobotFileParser":
        p = cls()
        entries = []
        for ed in d["entries"]:
            e = Entry(
                useragents=list(ed["useragents"]),
                crawl_delay=ed["crawl_delay"],
                req_rate=tuple(ed["req_rate"]) if ed["req_rate"] else None,
            )
            e.rulelines = [RuleLine(p_, a) for p_, a in ed["rulelines"]]
            entries.append(e)
        if entries:
            p.default_entry = entries.pop()
        p.entries = entries
        p.disallow_all = d["disallow_all"]
        p.allow_all = d["allow_all"]
        p.last_checked = d["last_checked"]
        return p
