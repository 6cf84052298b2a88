"""Driver-side fetch configuration — env merge parity with the reference.

loadEnvConfig (/root/reference/src/adapters/simple.ts:36-43, mirrored in
dom.ts:56-63, crawlee.ts:170-177, crawl4ai.ts:132-143; precedence doc
README.md:336-354): env vars fill in under user options — USER OPTIONS WIN.

Env vars (names preserved from the reference):
- HAVE_SPIDER_TIMEOUT       → timeout (ms, int)
- HAVE_SPIDER_USER_AGENT    → user_agent
- HAVE_SPIDER_MAX_REQUESTS  → max_requests (int)

Divergence-by-strictness, documented: the reference parses ``maxRequests``
but never enforces it anywhere in src (verified by grep — only schema
declarations). Here it is a real budget: the crawl scheduler caps total
fetches per run at ``max_requests`` when set.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# defaults from src/shared/types.ts:118-157
DEFAULT_TIMEOUT_MS = 30_000
DEFAULT_CACHE_EXPIRY_MS = 300_000


@dataclass
class FetchOptions:
    timeout: int = DEFAULT_TIMEOUT_MS
    user_agent: str | None = None
    max_requests: int | None = None
    cache: bool = True
    cache_expiry: int = DEFAULT_CACHE_EXPIRY_MS


def _int_or_none(v: str | None) -> int | None:
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        return None  # invalid env values ignored, like Number() → NaN path


def load_env_config(user: dict | None = None, env: dict | None = None) -> FetchOptions:
    """Merge env under user options (user wins), reference precedence."""
    env = os.environ if env is None else env
    user = user or {}
    merged = FetchOptions()
    t = _int_or_none(env.get("HAVE_SPIDER_TIMEOUT"))
    if t is not None:
        merged.timeout = t
    ua = env.get("HAVE_SPIDER_USER_AGENT")
    if ua:
        merged.user_agent = ua
    mr = _int_or_none(env.get("HAVE_SPIDER_MAX_REQUESTS"))
    if mr is not None:
        merged.max_requests = mr
    # user options override env
    if "timeout" in user and user["timeout"] is not None:
        merged.timeout = int(user["timeout"])
    if user.get("user_agent") is not None:
        merged.user_agent = user["user_agent"]
    if user.get("max_requests") is not None:
        merged.max_requests = int(user["max_requests"])
    if user.get("cache") is not None:
        merged.cache = bool(user["cache"])
    if user.get("cache_expiry") is not None:
        merged.cache_expiry = int(user["cache_expiry"])
    return merged
