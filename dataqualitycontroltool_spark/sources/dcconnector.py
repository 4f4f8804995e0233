"""Data Catalogue REST connector (S10) — pathology/version listing.

Reference: `/root/reference/mipqctool/controller/dcconnector.py:7-48`
(requests to the Data Catalogue API, JSON of pathologies with versions).
Driver-side metadata I/O, no Spark content; the response PARSING is the
testable part (offline), the fetch is a thin urllib wrapper (stdlib — the
container has no ``requests``), usable only where the catalogue is
reachable.
"""

from __future__ import annotations

import json
import urllib.request

DEFAULT_BASE_URL = "https://datacatalogue.example.org/api"  # configure per deployment


def parse_pathologies(payload: list[dict] | str) -> dict[str, list[str]]:
    """{pathology_name: [version, ...]} from the catalogue's pathologies
    JSON (a list of {name, versions: [{name}, ...]} objects)."""
    if isinstance(payload, str):
        payload = json.loads(payload)
    out: dict[str, list[str]] = {}
    for p in payload:
        name = p.get("name")
        if not name:
            continue
        versions = [v.get("name") for v in p.get("versions", []) if v.get("name")]
        out[name] = versions
    return out


def fetch_pathologies(base_url: str = DEFAULT_BASE_URL, timeout: int = 30) -> dict[str, list[str]]:
    """GET ``<base>/pathologies`` and parse.  Network-dependent — callers in
    offline environments load the JSON themselves and use
    :func:`parse_pathologies`."""
    with urllib.request.urlopen(f"{base_url}/pathologies", timeout=timeout) as r:
        return parse_pathologies(r.read().decode("utf-8"))
