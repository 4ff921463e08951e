"""Parameterized declarative resource templates (S3; reference parity:
template load + ``{param}`` substitution + YAML parse,
/root/reference/src/copy_from_template.py:288-297, and the entityMap
query-rebinding at :355-356).

Driver-side config handling, not a distributed op: a template string with
``{param}`` placeholders is bound and parsed into a resource spec (list of
dicts), which the engine maps onto datasets/views/sinks.
"""

from __future__ import annotations

from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - environment without PyYAML
    yaml = None


def bind_template(template_text: str, params: dict[str, str]) -> str:
    """Replace ``{name}`` placeholders with bound values (string substitution
    before parse, exactly the reference's ordering)."""
    out = template_text
    for k, v in params.items():
        out = out.replace("{" + k + "}", v)
    return out


def load_resource_spec(template_text: str, params: dict[str, str]) -> Any:
    """Bind then parse: the IR is a plain list/dict resource spec."""
    if yaml is None:
        raise ImportError("PyYAML is required for YAML resource templates")
    return yaml.safe_load(bind_template(template_text, params))


def rebind_ids(query_text: str, entity_map: dict[str, str]) -> str:
    """Rewrite old→new ids inside stored query text (the wiki entityMap
    substitution, copy_from_template.py:343-356)."""
    out = query_text
    for old, new in entity_map.items():
        out = out.replace(old, new)
    return out
