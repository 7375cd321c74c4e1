"""Page fetchers: retrying HTTP (urllib, stdlib) and offline fixtures.

Reference: ``fetch_url_with_retries`` (PhocusWire/PhocusWireSource.py:58-82,
Skift/SkiftSource.py:53-77): max_retries=3, exponential backoff
``backoff_factor * 2**attempt``, timeout=10 s, None after exhaustion; plus
the politeness sleep between pages (uniform(min_delay, max_delay),
PhocusWire/PhocusWireSource.py:206-209).

Both fetchers present ``fetch(page_no) -> html | None`` so the data source
is transport-agnostic and fully testable offline.
"""

from __future__ import annotations

import json
import logging
import os
import random
import time
import urllib.error
import urllib.request
from dataclasses import dataclass

logger = logging.getLogger(__name__)

DEFAULT_HEADERS = {"User-Agent": "Mozilla/5.0 (compatible; news-pipeline-spark/0.1)"}


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 3
    backoff_factor: float = 1.0
    timeout_s: float = 10.0
    min_delay_s: float = 1.0
    max_delay_s: float = 3.0


class HttpPageFetcher:
    """Sequential polite fetcher for one host.

    Runs inside a single source partition: politeness (one in-flight request
    per host, inter-page sleep) is a *correctness* constraint of scraping, so
    the scan is deliberately not parallel per host (SURVEY.md §4.3); Spark
    parallelism comes from running many hosts' partitions concurrently.
    """

    def __init__(
        self,
        url_template: str,
        policy: RetryPolicy = RetryPolicy(),
        headers: dict[str, str] | None = None,
    ):
        self.url_template = url_template  # e.g. '.../Latest-News?pg={page}'
        self.policy = policy
        # per-source header overlay on the defaults (reference parity:
        # each source passes its own headers dict to fetch_url_with_retries,
        # PhocusWire/PhocusWireSource.py:58-82)
        self.headers = {**DEFAULT_HEADERS, **(headers or {})}
        self._first = True

    def fetch(self, page_no: int) -> str | None:
        if not self._first:
            delay = random.uniform(self.policy.min_delay_s, self.policy.max_delay_s)
            time.sleep(delay)
        self._first = False
        url = self.url_template.format(page=page_no)
        for attempt in range(self.policy.max_retries):
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.policy.timeout_s) as resp:
                    if resp.status == 200:
                        return resp.read().decode("utf-8", errors="replace")
                    raise urllib.error.HTTPError(
                        url, resp.status, "bad status", resp.headers, None
                    )
            except Exception as exc:  # noqa: BLE001 — retry any transport error
                wait = self.policy.backoff_factor * (2**attempt)
                logger.warning("fetch %s attempt %d failed (%s); backoff %.1fs",
                               url, attempt + 1, exc, wait)
                time.sleep(wait)
        logger.error("giving up on %s after %d attempts", url, self.policy.max_retries)
        return None


class FixturePageFetcher:
    """Reads ``{pages_dir}/page_{n}.html``; None when the file is absent
    (≡ the reference's empty-page stop condition)."""

    def __init__(self, pages_dir: str):
        self.pages_dir = pages_dir

    def fetch(self, page_no: int) -> str | None:
        path = os.path.join(self.pages_dir, f"page_{page_no}.html")
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return f.read()


def make_fetcher(options: dict) -> HttpPageFetcher | FixturePageFetcher:
    """Build a fetcher from data-source options: ``pages_dir`` selects the
    offline fixture transport, ``url_template`` the polite HTTP one.
    ``headers`` (a dict, or a JSON object string as Spark option values
    are) overlays the default request headers per source; the politeness
    and retry knobs round-trip the same way."""
    if options.get("pages_dir"):
        return FixturePageFetcher(options["pages_dir"])
    if options.get("url_template"):
        headers = options.get("headers") or {}
        if isinstance(headers, str):
            headers = json.loads(headers)
        return HttpPageFetcher(
            options["url_template"],
            RetryPolicy(
                max_retries=int(options.get("max_retries", 3)),
                backoff_factor=float(options.get("backoff_factor", 1.0)),
                timeout_s=float(options.get("timeout_s", 10.0)),
                min_delay_s=float(options.get("min_delay_s", 1.0)),
                max_delay_s=float(options.get("max_delay_s", 3.0)),
            ),
            headers=headers,
        )
    raise ValueError("listing source needs 'pages_dir' or 'url_template'")
