"""robots.txt gating (engine-new per the north star; the reference has no
robots handling — F5's protocol gate is extended with it).

A minimal robots.txt interpreter: ``User-agent`` groups, ``Disallow`` /
``Allow`` prefix rules, longest-match-wins (Google's documented semantics),
``*`` wildcard group applies when no specific group matches. Fetched through
the same transport as pages and cached per host; a missing/erroring
robots.txt allows everything (the common crawler default).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for rule in self.disallow:
            if rule and path.startswith(rule) and len(rule) > best_len:
                best_len, best_allow = len(rule), False
        for rule in self.allow:
            if rule and path.startswith(rule) and len(rule) >= best_len:
                best_len, best_allow = len(rule), True
        return best_allow


def parse_robots(text: str, user_agent: str = "*") -> RobotsRules:
    rules = RobotsRules()
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
        if key == "user-agent":
            if in_group_body:
                current_agents = []
                in_group_body = False
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
    rules = specific if saw_specific else generic
    return rules


class RobotsCache:
    """Per-host rules cache living inside each fetch worker (broadcast-small-
    side lookup — one robots fetch per host per worker, never a shuffle)."""

    def __init__(self, transport, user_agent: str = "engine-crawler"):
        self.transport = transport
        self.user_agent = user_agent
        self.cache: dict[str, RobotsRules] = {}

    def allowed(self, canon_url: str) -> bool:
        from .canon import host_of

        host = host_of(canon_url)
        if not host:
            return True
        rules = self.cache.get(host)
        if rules is None:
            rules = self._fetch_rules(canon_url, host)
            self.cache[host] = rules
        scheme_end = canon_url.find("://")
        path_start = canon_url.find("/", scheme_end + 3)
        path = canon_url[path_start:] if path_start != -1 else "/"
        return rules.allowed(path)

    def _fetch_rules(self, canon_url: str, host: str) -> RobotsRules:
        scheme = canon_url.split(":", 1)[0]
        robots_url = f"{scheme}://{host}/robots.txt"
        try:
            response = self.transport(robots_url)
            if getattr(response, "ok", False):
                return parse_robots(response.text(), self.user_agent)
        except Exception:
            pass
        return RobotsRules()  # missing/erroring robots.txt allows everything
