"""One-time migration: vk/snark artifacts from hex-pickle cs -> structural cs.

Round-4 artifacts embedded `pickle.dumps(cs).hex()` inside .vk sidecars and
.proof snark files (flagged as an arbitrary-code-execution hazard for
attacker-supplied files, VERDICT r4 weak #9).  This converts LOCAL, TRUSTED
artifacts in ./build to the pickle-free `ConstraintSystem.to_dict` format
(version 2) and verifies the digest is unchanged.

Usage: python tools/migrate_artifacts.py [dir=build]
"""
import glob
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_zkcert_tpu.plonk.cs import ConstraintSystem  # noqa: E402


def migrate_vk_dict(d: dict) -> bool:
    if not isinstance(d["cs"], str):
        return False
    cs = pickle.loads(bytes.fromhex(d["cs"]))
    new = ConstraintSystem.from_dict(cs.to_dict())
    assert new.digest_bytes() == cs.digest_bytes(), "round-trip digest drift"
    d["cs"] = cs.to_dict()
    return True


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "build"
    for path in sorted(glob.glob(os.path.join(d, "*.vk"))):
        with open(path) as f:
            blob = json.load(f)
        if migrate_vk_dict(blob):
            with open(path, "w") as f:
                json.dump(blob, f)
            print(f"migrated {path}")
    for path in sorted(glob.glob(os.path.join(d, "*.proof"))):
        with open(path) as f:
            blob = json.load(f)
        changed = migrate_vk_dict(blob["vk"])
        if blob.get("version", 1) < 2:
            blob["version"] = 2
            changed = True
        if changed:
            with open(path, "w") as f:
                json.dump(blob, f)
            print(f"migrated {path}")


if __name__ == "__main__":
    main()
