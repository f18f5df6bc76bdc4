#!/usr/bin/env python
"""mysqlbinlog-style text dump of the engine's wire files — the ops
inspection surface (`mysqlbinlog file` / `SHOW BINLOG EVENTS` in text
form). Pure Python, no Spark session.

    python tools/binlogdump.py /path/to/wire/binlog.000001 [...]
    python tools/binlogdump.py --remote HOST:PORT FILE [POS]   # via dump_server
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_cdc_spark import binlog_wire as W  # noqa: E402

_NAMES = {
    W.QUERY_EVENT: "Query", W.FORMAT_DESCRIPTION_EVENT: "Format_desc",
    W.XID_EVENT: "Xid", W.TABLE_MAP_EVENT: "Table_map",
    W.WRITE_ROWS_EVENT: "Write_rows", W.UPDATE_ROWS_EVENT: "Update_rows",
    W.DELETE_ROWS_EVENT: "Delete_rows",
    W.WRITE_ROWS_EVENT_V1: "Write_rows_v1",
    W.UPDATE_ROWS_EVENT_V1: "Update_rows_v1",
    W.DELETE_ROWS_EVENT_V1: "Delete_rows_v1",
    W.ROTATE_EVENT: "Rotate", W.XA_PREPARE_EVENT: "XA_prepare",
    W.SEQUENCE_EVENT: "Sequence", W.GCN_EVENT: "Gcn",
    W.ROWS_QUERY_EVENT: "Rows_query", W.GTID_LOG_EVENT: "Gtid",
    W.ANONYMOUS_GTID_LOG_EVENT: "Anonymous_Gtid",
    W.PREVIOUS_GTIDS_LOG_EVENT: "Previous_gtids",
    W.HEARTBEAT_LOG_EVENT: "Heartbeat",
    W.TRANSACTION_PAYLOAD_EVENT: "Transaction_payload",
    W.PARTIAL_UPDATE_ROWS_EVENT: "Update_rows_partial",
    W.INTVAR_EVENT: "Intvar", W.RAND_EVENT: "Rand",
    W.USER_VAR_EVENT: "User_var", W.STOP_EVENT: "Stop",
    W.INCIDENT_EVENT: "Incident", W.IGNORABLE_LOG_EVENT: "Ignorable",
    W.BEGIN_LOAD_QUERY_EVENT: "Begin_load_query",
    W.EXECUTE_LOAD_QUERY_EVENT: "Execute_load_query",
    W.MARIA_GTID_EVENT: "Maria_gtid",
    W.MARIA_GTID_LIST_EVENT: "Maria_gtid_list",
    W.MARIA_BINLOG_CHECKPOINT_EVENT: "Maria_binlog_checkpoint",
    W.MARIA_ANNOTATE_ROWS_EVENT: "Maria_annotate_rows",
}


def _info(ev: dict) -> str:
    t = ev["type"]
    if t == W.QUERY_EVENT:
        return ev.get("query", "")[:120]
    if t == W.TABLE_MAP_EVENT:
        extra = f" cols={ev['col_names']}" if "col_names" in ev else ""
        return f"{ev['db']}.{ev['tbl']} ({len(ev['types'])} columns){extra}"
    if t in W.ROWS_EVENTS:
        return f"{ev['db']}.{ev['tbl']} {len(ev['rows'])} row(s)"
    if t == W.XID_EVENT:
        return f"COMMIT xid={ev['xid']}"
    if t == W.GTID_LOG_EVENT:
        return f"GTID {ev['sid'].hex()}:{ev['gno']}"
    if t == W.PREVIOUS_GTIDS_LOG_EVENT:
        return ", ".join(
            f"{sid.hex()}:{'-'.join(map(str, iv))}"
            for sid, ivs in ev["gtid_set"].items() for iv in ivs
        )
    if t == W.GCN_EVENT:
        return f"gcn={ev['gcn']}"
    if t == W.SEQUENCE_EVENT:
        return f"type={ev['sequence_type']} num={ev['sequence_num']}"
    if t == W.ROWS_QUERY_EVENT:
        return ev.get("rows_query", "")[:120]
    if t == W.ROTATE_EVENT:
        return f"next={ev['next_file']} pos={ev['position']}"
    if t == W.TRANSACTION_PAYLOAD_EVENT:
        alg = {W.COMPRESS_ZSTD: "ZSTD", W.COMPRESS_NONE: "NONE"}.get(
            ev["compression_type"], ev["compression_type"]
        )
        inner = ", ".join(
            _NAMES.get(e["type"], f"Unknown({e['type']})")
            for e in ev.get("events", [])
        )
        return (f"{alg} uncompressed={ev['uncompressed_size']}B "
                f"[{inner}]")[:160]
    if t == W.HEARTBEAT_LOG_EVENT:
        return ev.get("log_ident", "")
    if t == W.INCIDENT_EVENT:
        return (f"#{ev.get('incident_number')} "
                f"{ev.get('incident_message', '')}")[:120]
    if t == W.INTVAR_EVENT:
        kind = {1: "LAST_INSERT_ID", 2: "INSERT_ID"}.get(
            ev.get("intvar_type"), ev.get("intvar_type"))
        return f"{kind}={ev.get('intvar_value')}"
    if t == W.USER_VAR_EVENT:
        return f"@{ev.get('var_name')}={ev.get('var_value')!r}"[:120]
    if t == W.EXECUTE_LOAD_QUERY_EVENT:
        return f"file_id={ev.get('file_id')} {ev.get('query', '')[:100]}"
    if t == W.MARIA_GTID_EVENT:
        return (f"{ev.get('gtid_domain_id')}-{ev.get('server_id')}"
                f"-{ev.get('gtid_seq_no')}")
    if t == W.MARIA_BINLOG_CHECKPOINT_EVENT:
        return ev.get("checkpoint_file", "")
    return ""


def dump_bytes(body: bytes, file_label: str) -> None:
    import struct

    pos = 0
    events = W.decode_events(body, tolerate_truncation=True)
    off = 0
    for ev in events:
        elen = struct.unpack_from("<I", body, off + 9)[0]
        name = _NAMES.get(ev["type"], f"Unknown({ev['type']})")
        print(f"# at {off + 4}")
        print(
            f"#{ev['timestamp']} server id {ev['server_id']}  "
            f"end_log_pos {off + 4 + elen}  {name}\t{_info(ev)}"
        )
        off += elen
        pos += 1
    print(f"# {file_label}: {pos} events")


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    if args[0] == "--remote":
        from polardbx_cdc_spark import dump_server as D

        host, port = args[1].rsplit(":", 1)
        body = D.dump_fetch(host, int(port), args[2],
                            int(args[3]) if len(args) > 3 else 4)
        dump_bytes(body, f"{args[1]}/{args[2]}")
        return
    for path in args:
        with open(path, "rb") as fh:
            buf = fh.read()
        if buf[:4] != W.MAGIC:
            print(f"# {path}: not a binlog file", file=sys.stderr)
            continue
        print(f"# File: {path}")
        dump_bytes(buf[4:], os.path.basename(path))


if __name__ == "__main__":
    main()
