#!/usr/bin/env python3
"""Source-hygiene gate: no raw control bytes (other than \\t \\n \\r) in any
source file under the given roots.

Why a Python scanner and not grep: a raw NUL makes GNU grep classify the file
as BINARY and silently skip it in content greps, blinding every grep-based
audit (LEAKCHECK/COPYCHECK included) — and grep's own PCRE mode cannot match
NUL (`grep -P '\\x00'` is vacuously green because PCRE patterns are
NUL-terminated strings). Round 14 shipped exactly that blind spot: the check
passed while MultimodalSpec.scala carried 4 raw NULs. This scanner reads
bytes, so NUL is just another byte.

Usage: check_control_bytes.py root [root ...]
Exit 0 + no output when clean; exit 1 + one line per offending file otherwise.

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys
import pathlib

BAD = set(range(0x00, 0x09)) | {0x0B, 0x0C} | set(range(0x0E, 0x20))

offenders = []
for root in sys.argv[1:]:
    for p in sorted(pathlib.Path(root).rglob("*")):
        if not p.is_file():
            continue
        data = p.read_bytes()
        hits = [(i, b) for i, b in enumerate(data) if b in BAD]
        if hits:
            i, b = hits[0]
            line = data[:i].count(b"\n") + 1
            offenders.append(
                f"{p}: {len(hits)} control byte(s), first 0x{b:02x} at "
                f"offset {i} (line {line})")

if offenders:
    print("\n".join(offenders))
    sys.exit(1)
sys.exit(0)
