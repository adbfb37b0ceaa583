"""Secrets/auth config merge (SURVEY.md S6).

The reference fetches a SecretsManager secret named by
``config.secretKey`` and merges it into the source config before
dispatch (fetchSecret utils.js:90-122; merge providers.js:42-45).
Out-of-band config, not a dataflow op — locally the secret store is the
environment: ``SECRET_{secretKey}`` holds a JSON object merged into
``meta``. On a cluster, swap ``lookup`` for the real secrets SDK call
on the driver; nothing else changes.
"""

from __future__ import annotations

import json
import os
from typing import Any


def lookup(secret_key: str) -> dict[str, Any] | None:
    raw = os.environ.get(f"SECRET_{secret_key}")
    return json.loads(raw) if raw else None


def merge_secret(config: dict[str, Any]) -> dict[str, Any]:
    """Return config with its secret merged into meta (secret values
    win, like the reference's object spread). No secretKey → unchanged.
    Missing secret → KeyError: a deliberate local HARDENING over the
    reference, whose fetchSecret swallows the lookup error
    (``.catch`` → ``{}``, fetcher/lib/utils.js:90-122) and dispatches
    without credentials — deferring the failure to an opaque auth
    error (or silent empty result) at fetch time. Failing loud at
    merge time names the missing secret instead.
    """
    key = config.get("secretKey")
    if not key:
        return config
    secret = lookup(key)
    if secret is None:
        raise KeyError(f"secret {key!r} not found (set SECRET_{key})")
    return {**config, "meta": {**config.get("meta", {}), **secret}}
