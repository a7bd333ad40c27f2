"""Shared accessor for Spark's UI REST API (one copy for every stress runner).

The skew and multi-JVM runners both read executor/stage metrics from
``<uiWebUrl>/api/v1/applications/<appId>/...``; keeping the accessor here
means a fix (retry, renamed field, auth) lands in every report at once.
"""

from __future__ import annotations

import json
import urllib.request


def rest(spark, path: str):
    """GET ``/api/v1/applications/<appId><path>`` from the live UI as JSON."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)
