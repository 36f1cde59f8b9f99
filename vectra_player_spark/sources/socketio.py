"""Socket.IO / Engine.IO frame parsing (SURVEY §2.3 F10, §2.1 S10).

Stream-ingest decode of raw WebSocket frames into typed event dicts,
re-implementing the reference's parser semantics
(src/sources/socketio_parser.py:44-185) from the public Socket.IO v4 /
Engine.IO v4 protocol:

    <engine.io type><socket.io type></namespace,><ack id>[json payload]

- engine.io types: 0 open, 1 close, 2 ping, 3 pong, 4 message
- socket.io types (inside message): 0 connect, 1 disconnect, 2 event,
  3 ack, 4 error, 5 binary event, 6 binary ack
- event payload: JSON array ["eventName", data]; the traced 3-element
  format carries data at index 2 (parser.py "parsed[2]" handling).

Exposed both as a plain function (driver-side / tests) and as an
Arrow-batched pandas UDF for the streaming ingest path — parsing is the
one genuinely-Python stage of ingest (per-frame string surgery), so it
rides the Arrow batch channel rather than row-at-a-time serde.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENGINE_IO_TYPES = {
    "0": "open",
    "1": "close",
    "2": "ping",
    "3": "pong",
    "4": "message",
}
SOCKET_IO_TYPES = {
    "0": "connect",
    "1": "disconnect",
    "2": "event",
    "3": "ack",
    "4": "error",
    "5": "binary_event",
    "6": "binary_ack",
}

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("frame_type", T.StringType(), True),
        T.StructField("packet_type", T.StringType(), True),
        T.StructField("namespace", T.StringType(), True),
        T.StructField("ack_id", T.LongType(), True),
        T.StructField("event_name", T.StringType(), True),
        T.StructField("data_json", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def parse_socketio_frame(raw: str) -> dict:
    """Decode one raw frame. Never raises — malformed frames return a dict
    with `parse_error` set (ingest must survive garbage, like the
    reference's skip-malformed discipline)."""
    out = {
        "frame_type": None,
        "packet_type": None,
        "namespace": None,
        "ack_id": None,
        "event_name": None,
        "data_json": None,
        "parse_error": None,
    }
    try:
        if not raw:
            out["parse_error"] = "empty frame"
            return out
        eio = raw[0]
        out["frame_type"] = ENGINE_IO_TYPES.get(eio)
        if out["frame_type"] is None:
            out["parse_error"] = f"unknown engine.io type {eio!r}"
            return out
        if out["frame_type"] != "message" or len(raw) == 1:
            return out
        rest = raw[1:]
        sio = rest[0]
        out["packet_type"] = SOCKET_IO_TYPES.get(sio)
        if out["packet_type"] is None:
            out["parse_error"] = f"unknown socket.io type {sio!r}"
            return out
        rest = rest[1:]
        if rest.startswith("/"):
            comma = rest.find(",")
            if comma == -1:
                out["namespace"] = rest
                return out
            out["namespace"] = rest[:comma]
            rest = rest[comma + 1 :]
        ack_digits = ""
        while rest and rest[0].isdigit():
            ack_digits += rest[0]
            rest = rest[1:]
        if ack_digits:
            out["ack_id"] = int(ack_digits)
        if not rest:
            return out
        payload = json.loads(rest)
        if isinstance(payload, list) and payload:
            out["event_name"] = payload[0] if isinstance(payload[0], str) else None
            if len(payload) == 3:
                # traced 3-element format: data sits at index 2
                out["data_json"] = json.dumps(payload[2])
            elif len(payload) >= 2:
                out["data_json"] = json.dumps(payload[1])
        else:
            out["data_json"] = json.dumps(payload)
    except Exception as e:  # noqa: BLE001 — ingest never dies on one frame
        out["parse_error"] = str(e)[:200]
    return out


def parse_frames_udf(col: Column | str) -> Column:
    """Arrow-batched column form for the streaming ingest path."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(FRAME_SCHEMA)
    def _parse(frames: pd.Series) -> pd.DataFrame:
        rows = [parse_socketio_frame(fr) for fr in frames]
        return pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    c = F.col(col) if isinstance(col, str) else col
    return _parse(c)
