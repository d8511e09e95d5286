"""robots.txt gating (engine-new per the north star; the reference has no
robots handling — F5's protocol gate is extended with it).

A robots.txt interpreter with Google's documented semantics: ``User-agent``
groups, ``Disallow`` / ``Allow`` path rules with ``*`` wildcards and ``$``
end anchors, longest-pattern-wins (Allow wins ties), the ``*`` group
applying when no specific group matches. Fetched through the same transport
as pages and cached per AUTHORITY (host:port — a site on :8080 is not the
site on :80). Status handling follows RFC 9309: 4xx (unavailable) allows
everything, 5xx and transport errors are treated as disallow-all, with
errors NOT negatively cached so a transient failure doesn't pin a policy
for the worker's lifetime.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _compile_rule(rule: str):
    """Google semantics: '*' matches any char run, a trailing '$' anchors
    the end; everything else is literal. Returns a compiled prefix-match
    regex, or None for unusable rules."""
    if not rule:
        return None
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    pattern = ".*".join(re.escape(part) for part in rule.split("*"))
    return re.compile(pattern + ("$" if anchored else ""))


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    disallow_all: bool = False  # RFC 9309 "unreachable" posture
    # RFC 9309 §2.3 Sitemap lines are GLOBAL (not per-group): collected in
    # file order, deduplicated, regardless of which user-agent group
    # surrounds them — a crawler can seed these into its frontier
    sitemaps: list[str] = field(default_factory=list)

    def __post_init__(self):
        self._compiled: list[tuple[int, bool, object]] | None = None

    def _rules(self):
        # (pattern_length, is_allow, regex) — precedence is by PATTERN length
        # (Google: the '$'-stripped literal length incl. '*'s), Allow on ties
        if self._compiled is None:
            compiled = []
            for is_allow, rules in ((False, self.disallow), (True, self.allow)):
                for rule in rules:
                    regex = _compile_rule(rule)
                    if regex is not None:
                        compiled.append((len(rule.rstrip("$")), is_allow, regex))
            self._compiled = compiled
        return self._compiled

    def allowed(self, path: str) -> bool:
        if self.disallow_all:
            return False
        best_len = -1
        best_allow = True
        for length, is_allow, regex in self._rules():
            if regex.match(path) and (
                length > best_len or (length == best_len and is_allow)
            ):
                best_len, best_allow = length, is_allow
        return best_allow


def parse_robots(text: str, user_agent: str = "*") -> RobotsRules:
    current_agents: list[str] = []
    group_matches = False
    saw_specific = False
    generic = RobotsRules()
    specific = RobotsRules()
    in_group_body = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            # global line: dedup, keep file order, attach to BOTH candidate
            # rule sets so the chosen one carries it
            if value and value not in generic.sitemaps:
                generic.sitemaps.append(value)
                specific.sitemaps.append(value)
            continue
        if key == "user-agent":
            if in_group_body:
                current_agents = []
                in_group_body = False
            if not value:
                continue  # an empty agent matches nothing (RFC: invalid)
            current_agents.append(value.lower())
            group_matches = any(
                agent == "*" or agent in user_agent.lower() for agent in current_agents
            )
        elif key in ("disallow", "allow"):
            in_group_body = True
            if not current_agents:
                continue
            target = None
            if any(agent != "*" and agent in user_agent.lower() for agent in current_agents):
                target = specific
                saw_specific = True
            elif "*" in current_agents:
                target = generic
            if target is not None and group_matches:
                (target.disallow if key == "disallow" else target.allow).append(value)
    return specific if saw_specific else generic


_DISALLOW_ALL = RobotsRules(disallow_all=True)


class RobotsCache:
    """Per-authority rules cache living inside each fetch worker (broadcast-
    small-side lookup — one robots fetch per authority per worker, never a
    shuffle)."""

    def __init__(self, transport, user_agent: str = "engine-crawler"):
        self.transport = transport
        self.user_agent = user_agent
        self.cache: dict[str, RobotsRules] = {}

    def allowed(self, canon_url: str) -> bool:
        scheme_end = canon_url.find("://")
        if scheme_end == -1:
            return True
        path_start = canon_url.find("/", scheme_end + 3)
        authority = (
            canon_url[scheme_end + 3 : path_start]
            if path_start != -1
            else canon_url[scheme_end + 3 :]
        )
        if not authority:
            return True
        scheme = canon_url[:scheme_end]
        cache_key = f"{scheme}://{authority}"
        rules = self.cache.get(cache_key)
        if rules is None:
            rules = self._fetch_rules(cache_key)
            if rules is not None:
                self.cache[cache_key] = rules
            else:
                # transport error: RFC 9309 unreachable → treat as
                # disallow-all but DON'T cache, so a transient failure
                # doesn't pin the policy for the worker's lifetime
                rules = _DISALLOW_ALL
        path = canon_url[path_start:] if path_start != -1 else "/"
        return rules.allowed(path)

    def _fetch_rules(self, origin: str) -> RobotsRules | None:
        robots_url = f"{origin}/robots.txt"
        try:
            response = self.transport(robots_url)
        except Exception:
            return None  # unreachable: disallow-all, not cached
        status = getattr(response, "status", 0)
        if getattr(response, "ok", False):
            return parse_robots(response.text(), self.user_agent)
        if 500 <= status < 600:
            return RobotsRules(disallow_all=True)  # RFC 9309 server error
        return RobotsRules()  # 4xx/unparseable: allows everything


def robots_gate(pages_ds, robots_texts: dict, url_col: str = "url",
                user_agent: str = "engine-crawler"):
    """Batch robots gate: evaluate every URL against its host's robots.txt
    (the same RFC 9309 + Google-semantics matcher the crawl scheduler
    uses) WITHOUT a crawl — the offline compliance audit / pre-filter a
    pipeline runs over an already-collected URL table.

    ``robots_texts`` maps ORIGIN (``scheme://host[:port]``) → robots.txt
    text — the RobotsCache keying above: a site on :8080 is not the site
    on :443, and http and https may serve different rules. The table is
    small relative to the URL corpus; at scale it ships once via the
    object store like every broadcast side. Texts parse ONCE per actor per
    origin (lazy dict), rows evaluate per batch. Origins absent from the
    map allow everything (RFC 9309 4xx posture). Zero shuffle.

    Output: input columns + host, path, allowed.
    """
    import pyarrow as pa
    import ray

    from .canon import _SURT_AUTH_RE, canonicalize

    texts_ref = ray.put(dict(robots_texts))

    class _Gate:
        def __init__(self):
            self._texts = ray.get(texts_ref)
            self._rules: dict[str, RobotsRules] = {}

        def _origin_rules(self, origin: str) -> RobotsRules:
            rules = self._rules.get(origin)
            if rules is None:
                text = self._texts.get(origin)
                rules = (parse_robots(text, user_agent)
                         if text is not None else RobotsRules())
                self._rules[origin] = rules
            return rules

        def __call__(self, batch: pa.Table) -> pa.Table:
            hosts, paths, allowed = [], [], []
            for url in batch.column(url_col).to_pylist():
                canon = canonicalize(url or "")
                host = canon.host
                # path?query sans fragment, port/userinfo-safe (the SURT
                # authority split) — RFC 9309 matches on path + query;
                # group(1) is the full authority incl. port, sans userinfo
                m = _SURT_AUTH_RE.match(canon.canon_url) if host else None
                rest = m.group(2) if m else ""
                path = rest if rest.startswith("/") else "/" + rest
                origin = (f"{canon.canon_url.split(':', 1)[0]}://{m.group(1)}"
                          if m else "")
                hosts.append(host)
                paths.append(path)
                allowed.append(self._origin_rules(origin).allowed(path))
            return (
                batch.append_column("host", pa.array(hosts, pa.string()))
                .append_column("path", pa.array(paths, pa.string()))
                .append_column("allowed", pa.array(allowed, pa.bool_()))
            )

    return pages_ds.map_batches(_Gate, batch_format="pyarrow",
                                concurrency=(1, 8))
