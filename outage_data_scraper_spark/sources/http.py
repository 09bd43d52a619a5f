"""Real-network FetchFn for the crawl engine (stdlib urllib only).

Re-expresses the reference's request layer (app/scrapers/util.py:63–89):
a spoofed desktop-browser User-Agent, a 10 s timeout, GET by default and
POST with a JSON body where a site family's endpoint requires it. Unlike
the reference — which prints errors and returns None — failures come back
as structured (status, reason, None) rows so the failure side-output
(O23) captures them per URL.

The factory is what plugs into ``Crawler``/``fetch_wave``: it is invoked
once per fetch partition, executor-side, so each partition gets its own
opener (and politeness token buckets pace calls around it). Tests never
touch the real network — they drive this against an in-process
http.server (tests/test_http_fetcher.py).
"""

from __future__ import annotations

import json
from collections.abc import Callable

# The reference spoofs a desktop Chrome UA (util.py:66–69).
DEFAULT_UA = (
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_2) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/109.0.0.0 Safari/537.36"
)
DEFAULT_TIMEOUT_S = 10.0  # util.py:74


def make_http_fetcher(
    user_agent: str = DEFAULT_UA,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    post_json: dict[str, dict] | None = None,
    extra_headers: dict[str, str] | None = None,
) -> Callable[[], Callable]:
    """Build a fetcher_factory for real HTTP.

    ``post_json`` maps family → JSON body: those families are fetched via
    POST with ``Content-Type: application/json`` (the util.py:82–84
    path); everything else is a GET.
    """
    headers = {
        "User-Agent": user_agent,
        # the reference transparently receives decoded bodies through
        # seleniumwire (seleniumwire.utils.decode, ga_scraper.py:412–415);
        # urllib does NOT auto-decompress, so advertise and decode by hand
        "Accept-Encoding": "gzip, deflate",
        **(extra_headers or {}),
    }
    post_json = post_json or {}

    def factory():
        # imported inside the factory: the closure ships to executors via
        # cloudpickle, and a module-level `urllib` reference deserializes
        # as the bare package without its submodules loaded
        import gzip
        import urllib.error
        import urllib.request
        import zlib

        def decode_body(resp, raw: bytes) -> bytes:
            enc = (resp.headers.get("Content-Encoding") or "").strip().lower()
            if enc == "gzip":
                return gzip.decompress(raw)
            if enc == "deflate":
                try:
                    return zlib.decompress(raw)  # RFC 1950 zlib-wrapped
                except zlib.error:
                    return zlib.decompress(raw, -zlib.MAX_WBITS)  # raw deflate
            return raw

        def fetch(url: str, family: str) -> tuple[int, str | None, bytes | None]:
            body = post_json.get(family)
            if body is not None:
                req = urllib.request.Request(
                    url,
                    data=json.dumps(body).encode(),
                    headers={**headers, "Content-Type": "application/json"},
                    method="POST",
                )
            else:
                req = urllib.request.Request(url, headers=headers, method="GET")
            try:
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    raw = resp.read()
                    try:
                        return resp.status, None, decode_body(resp, raw)
                    except (OSError, zlib.error, EOFError) as e:
                        # corrupt compressed body: a per-URL failure row
                        # (O23), never a task abort
                        return 590, f"content-decode-error: {e}", None
            except urllib.error.HTTPError as e:
                return e.code, str(e.reason), None
            except urllib.error.URLError as e:
                if isinstance(e.reason, TimeoutError):
                    return 598, "timeout", None
                return 599, str(e.reason), None
            except TimeoutError:
                return 598, "timeout", None

        return fetch

    return factory
