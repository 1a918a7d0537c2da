"""Fetch / verify the reference's real benchmark datasets.

The reference's empirical results rest on seven external datasets
(reference: README.md:17-24). This script makes the real-data path a
one-command affair the moment the network allows:

    python scripts/fetch_data.py --root /data/pit            # download what it can
    python scripts/fetch_data.py --root /data/pit --verify   # check what's there
    python scripts/fetch_data.py --instructions              # manual steps

then ``export PIT_REAL_DATA_DIR=/data/pit`` — every CLI run and the
env-gated integration tests (tests/test_real_data.py) pick the real data
up automatically (cli._resolve_data_path, data/catalog.py layout).

What can be automated: the Burgers/Sod archives live on Zenodo (record
7118642), which has a stable JSON API — downloaded directly. The FNO /
Geo-FNO / cylinder datasets live in Google Drive FOLDERS, which cannot be
listed anonymously without extra tooling; for those this script accepts a
user-supplied ``--gdrive-ids ids.json`` mapping relative file paths to
Drive file ids (obtained from the folder's share links) and downloads via
the uc?export=download endpoint (with the large-file confirm-token
dance). Otherwise it prints exact manual instructions.
"""

import argparse
import json
import os
import re
import shutil
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

from position_induced_transformer_tpu.data.catalog import DATASETS

ZENODO_RECORD = "7118642"  # Lanthaler et al. (reference: README.md:18-19)
ZENODO_FILES = {  # dataset -> substring to match in the record's file list
    "burgers": "burgers",
    "sod": "sod",
}


def _download(url, dest, desc, opener=None):
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    print(f"  downloading {desc} -> {dest}", flush=True)
    req = urllib.request.Request(url, headers={"User-Agent": "pit-fetch/1"})
    open_fn = opener.open if opener is not None else urllib.request.urlopen
    with open_fn(req, timeout=120) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 20)
    os.replace(tmp, dest)
    return dest


def _looks_like_html(path):
    """True when a downloaded 'dataset' is actually an HTML page (Drive
    quota/virus-scan interstitials save cleanly and then shadow the real
    file forever if treated as present)."""
    with open(path, "rb") as f:
        head = f.read(512).lstrip().lower()
    return head.startswith(b"<!doctype html") or head.startswith(b"<html")


def fetch_zenodo(root):
    """Burgers/Sod from the Zenodo record via its JSON API (names looked
    up at run time — robust to archive naming)."""
    api = f"https://zenodo.org/api/records/{ZENODO_RECORD}"
    with urllib.request.urlopen(api, timeout=60) as r:
        record = json.load(r)
    from position_induced_transformer_tpu.data import loaders

    files = {f["key"]: f["links"]["self"] for f in record.get("files", [])}
    for bench, needle in ZENODO_FILES.items():
        target = os.path.join(root, f"data_{bench}.mat")
        if loaders._is_real_file(target):
            print(f"  {target} already present")
            continue
        matches = [k for k in files if needle in k.lower()]
        if not matches:
            print(f"  !! no {needle!r} file in zenodo record {ZENODO_RECORD}")
            continue
        got = _download(files[matches[0]], os.path.join(root, matches[0]),
                        f"zenodo {matches[0]}")
        _extract_or_place(got, target, needle)


def _extract_or_place(archive, target, needle):
    """Zenodo entries may be bare .mat files or zip archives; either way
    end with the catalog's canonical name."""
    if archive.lower().endswith(".zip"):
        import zipfile

        with zipfile.ZipFile(archive) as z:
            inner = [n for n in z.namelist() if needle in n.lower()
                     and n.lower().endswith(".mat")]
            if not inner:
                print(f"  !! {archive} has no {needle!r} .mat inside")
                return
            with z.open(inner[0]) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
        print(f"  extracted {inner[0]} -> {target}")
    elif archive != target:
        os.replace(archive, target)


def fetch_gdrive(root, ids_path):
    """Download Drive files given a user-supplied {relpath: file_id} map
    (Drive folders cannot be listed anonymously).

    Large files return an HTML interstitial whose confirm form must be
    re-submitted WITH the session cookies of the first response; the
    answer form's action/hidden-inputs are parsed rather than guessing
    the token, and anything that still comes back as HTML is deleted and
    reported instead of being saved under the dataset's name (a saved
    interstitial used to permanently shadow the real file because the
    presence check was a bare os.path.exists)."""
    import http.cookiejar
    import urllib.parse

    from position_induced_transformer_tpu.data import loaders

    ids = json.load(open(ids_path))
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar)
    )
    failed = []
    for rel, fid in ids.items():
        dest = os.path.join(root, rel)
        if loaders._is_real_file(dest) and not _looks_like_html(dest):
            print(f"  {dest} already present")
            continue
        url = f"https://drive.google.com/uc?export=download&id={fid}"
        req = urllib.request.Request(url, headers={"User-Agent": "pit-fetch/1"})
        with opener.open(req, timeout=120) as r:
            body = r.read(1 << 20)
            ctype = r.headers.get("Content-Type", "")
        if "text/html" in ctype:
            # interstitial: submit its confirm form (action + every hidden
            # input), reusing the opener so the session cookies ride along
            action = re.search(rb'<form[^>]+action="([^"]+)"', body)
            fields = dict(re.findall(
                rb'<input[^>]+name="([^"]+)"[^>]+value="([^"]*)"', body
            ))
            if action:
                base = action.group(1).decode().replace("&amp;", "&")
                qs = urllib.parse.urlencode(
                    {k.decode(): v.decode() for k, v in fields.items()}
                )
                url = base + ("&" if "?" in base else "?") + qs
            else:
                m = re.search(rb"confirm=([0-9A-Za-z_\-]+)", body)
                url += f"&confirm={m.group(1).decode() if m else 't'}"
        else:
            # small file: the first response already WAS the payload;
            # re-fetch through the cookie opener (cheap, keeps one path)
            pass
        _download(url, dest, f"gdrive {rel}", opener=opener)
        if _looks_like_html(dest):
            os.remove(dest)
            failed.append(rel)
            print(f"  !! gdrive {rel}: got an HTML page instead of data "
                  "(quota/permission interstitial) — removed; download it "
                  "in a browser (see --instructions)")
    return failed


def verify(root, names=None):
    """Load every present file and sanity-check keys/shapes; report which
    benchmarks are real-data ready. Exit 0 iff all requested are ready."""
    from position_induced_transformer_tpu.data import loaders
    from position_induced_transformer_tpu.data.catalog import available

    import numpy as np

    ok = True
    for bench, ds in DATASETS.items():
        if names and bench not in names:
            continue
        missing = [
            f for f in ds.files
            if not loaders._is_real_file(os.path.join(root, f))
        ]
        if missing:
            print(json.dumps({"benchmark": bench, "ready": False,
                              "missing": missing, "source": ds.source}))
            ok = False
            continue
        # load a small slice through the production loaders
        try:
            path = ds.data_path(root)
            if bench == "burgers":
                x, y, *_ = loaders.burgers(path, ntrain=4, ntest=2)
            elif bench == "sod":
                x, y, *_ = loaders.sod(path, ntrain=4, ntest=2)
            elif bench == "darcy":
                x, y, *_ = loaders.darcy(
                    os.path.join(path, "piececonst_r421_N1024_smooth1.mat"),
                    os.path.join(path, "piececonst_r421_N1024_smooth2.mat"),
                    ntrain=4, ntest=2,
                )
            elif bench == "vorticity":
                x, y, *_ = loaders.vorticity(path, ntrain=4, ntest=2)
            elif bench == "elasticity":
                x, _, y, *_ = loaders.elasticity(path, ntrain=4, ntest=2)
            elif bench == "naca":
                _, x, y, *_ = loaders.naca(path, ntrain=4, ntest=2)
            elif bench == "cylinder":
                x, y, *_ = loaders.cylinder(
                    os.path.join(path, "WakeCylinder_train.mat"),
                    os.path.join(path, "WakeCylinder_test.mat"),
                    os.path.join(path, "vertices.csv"),
                    os.path.join(path, "vertices_small.csv"),
                    ntrain=1, ntest=1,
                    elements_path=os.path.join(path, "elements.csv"),
                )
            assert np.isfinite(np.asarray(x)).all()
            print(json.dumps({
                "benchmark": bench, "ready": True,
                "x_shape": list(np.asarray(x).shape),
                "y_shape": list(np.asarray(y).shape),
            }))
        except Exception as e:
            ok = False
            print(json.dumps({"benchmark": bench, "ready": False,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
    assert available  # imported for parity with catalog API
    return ok


def instructions():
    print("Manual download steps (reference: README.md:17-24):\n")
    for bench, ds in DATASETS.items():
        print(f"[{bench}]  source: {ds.source}")
        for f in ds.files:
            print(f"    place as: $PIT_REAL_DATA_DIR/{f}")
        print()
    print(
        "Google Drive folders need a browser (or supply\n"
        "  --gdrive-ids ids.json  mapping each relative path above to the\n"
        "file's Drive id from its share link). Then:\n"
        "  python scripts/fetch_data.py --root $PIT_REAL_DATA_DIR --verify\n"
        "  export PIT_REAL_DATA_DIR=...   # CLI + tests pick it up"
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=os.environ.get("PIT_REAL_DATA_DIR"))
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--instructions", action="store_true")
    ap.add_argument("--gdrive-ids", default=None)
    ap.add_argument("benchmarks", nargs="*", help="restrict verify to these")
    args = ap.parse_args()
    if args.instructions:
        instructions()
        return 0
    if not args.root:
        ap.error("--root (or PIT_REAL_DATA_DIR) is required")
    os.makedirs(args.root, exist_ok=True)
    if args.verify:
        return 0 if verify(args.root, args.benchmarks or None) else 1
    try:
        fetch_zenodo(args.root)
    except Exception as e:
        print(f"zenodo fetch failed ({e}); see --instructions")
    if args.gdrive_ids:
        fetch_gdrive(args.root, args.gdrive_ids)
    else:
        print("No --gdrive-ids given; Drive-hosted datasets need manual "
              "download — run with --instructions for the exact layout.")
    # exit status reflects readiness of the requested benchmarks, same as
    # --verify (scripts/CI used to see 0 even when nothing was fetched)
    return 0 if verify(args.root, args.benchmarks or None) else 1


if __name__ == "__main__":
    sys.exit(main())
