"""robots.txt parsing and path matching — RFC 9309, spec-written.

The crawl-politeness gate every fetch pipeline runs before touching a
URL (Common Crawl's CCBot honors it). Semantics implemented:

* **Group selection** (§2.2.1): consecutive ``User-agent`` lines open a
  group sharing the rules that follow; the crawler obeys ALL groups whose
  agent token is the LONGEST substring of its own product token (rules of
  same-agent groups are combined into one, per the RFC's MUST), falling
  back to the union of every ``*`` group, else no rules (allow all).
* **Rule matching** (§2.2.2): ``Allow``/``Disallow`` values match from
  the first path byte; ``*`` matches any character run, a trailing ``$``
  anchors the end. The MOST SPECIFIC rule wins — longest pattern string —
  and on a length tie ``Allow`` wins. No matching rule means allowed.
* Comments (``#`` to end of line), blank lines, case-insensitive field
  names, and empty ``Disallow:`` values (a no-op per the RFC) are
  handled; unknown fields are skipped.

Per-row evaluation inside Arrow-batched ``mapInPandas``; the kernel
caches parsed rule lists per distinct robots text, so a corpus with a
bounded host set parses each robots.txt once per task.
"""

from __future__ import annotations

import re


def parse_robots(txt: str, agent: str = "bridgebot"):
    """robots.txt text → the rule list the given agent must obey:
    ``[(allow: bool, pattern: str, compiled regex or None), ...]``."""
    groups: list[tuple[list[str], list]] = []
    cur_agents: list[str] = []
    cur_rules: list = []
    for line in txt.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        k, _, v = line.partition(":")
        k, v = k.strip().lower(), v.strip()
        if k == "user-agent":
            if cur_rules:  # rules already seen: this line starts a NEW group
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(v.lower())
        elif k in ("allow", "disallow") and cur_agents:
            cur_rules.append((k == "allow", v, _compile(v)))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # §2.2.1: rules of every group matched by the same (most specific)
    # agent token MUST be combined into one group — real robots.txt files
    # commonly repeat `User-agent: *` blocks, so concatenate, don't pick
    # the first.
    al = agent.lower()
    best_len = max(
        (len(a) for agents, _ in groups for a in agents if a != "*" and a in al),
        default=-1,
    )
    if best_len >= 0:
        return [
            r
            for agents, rules in groups
            if any(a != "*" and a in al and len(a) == best_len for a in agents)
            for r in rules
        ]
    return [r for agents, rules in groups if "*" in agents for r in rules]


def _compile(pattern: str):
    """Rule value → anchored-at-start regex (``*`` → ``.*``, trailing
    ``$`` → end anchor). Empty patterns compile to None (no-op rule)."""
    if not pattern:
        return None
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
    return re.compile("^" + rx + (r"\Z" if anchored else ""))


def robots_allowed(rules, path: str):
    """(allowed, winning rule pattern) for ``path`` under ``rules`` —
    longest-pattern-wins, Allow wins length ties, default allow."""
    best_allow, best_len, best_pat = True, -1, ""
    for allow, pat, rx in rules:
        if rx is None or rx.match(path) is None:
            continue
        ml = len(pat)
        if ml > best_len or (ml == best_len and allow and not best_allow):
            best_allow, best_len, best_pat = allow, ml, pat
    return best_allow, best_pat
