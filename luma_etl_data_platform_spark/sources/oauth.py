"""OAuth token lifecycle for the lake source.

Re-implements the reference's token manager semantics (reference:
oauth/datalakeoauth.py:125-229): password-grant fetch, cached token,
proactive refresh when 90% of the TTL has elapsed
(oauth/datalakeoauth.py:153-156), thread-safe refresh. The actual
HTTP POST is injected (``fetch_fn``) — this module owns only the
lifecycle, which is what the Spark source needs on the driver.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable

REFRESH_FRACTION = 0.9  # reference: oauth/datalakeoauth.py:155


@dataclass
class Token:
    access_token: str
    expires_in: float      # seconds
    obtained_at: float     # epoch seconds

    def age(self, now: float) -> float:
        return now - self.obtained_at

    def needs_refresh(self, now: float) -> bool:
        return self.age(now) >= self.expires_in * REFRESH_FRACTION


class TokenProvider:
    def __init__(self, fetch_fn: Callable[[], dict],
                 clock: Callable[[], float] = time.time):
        self._fetch = fetch_fn
        self._clock = clock
        self._lock = threading.Lock()
        self._token: Token | None = None

    # Picklable so a transport carrying a provider can ship to
    # executors (fetch_object runs in tasks): the lock and any cached
    # token stay behind — each process re-authenticates on first use.
    def __getstate__(self):
        return {"_fetch": self._fetch, "_clock": self._clock}

    def __setstate__(self, state):
        self._fetch = state["_fetch"]
        self._clock = state["_clock"]
        self._lock = threading.Lock()
        self._token = None

    def get(self) -> str:
        now = self._clock()
        tok = self._token
        if tok is None or tok.needs_refresh(now):
            with self._lock:
                tok = self._token
                if tok is None or tok.needs_refresh(self._clock()):
                    raw = self._fetch()
                    tok = Token(
                        access_token=raw["access_token"],
                        expires_in=float(raw.get("expires_in", 3600)),
                        obtained_at=self._clock(),
                    )
                    self._token = tok
        return tok.access_token
