"""Dataset download manager (reference benchmark/download.py:1-106).

Manifest-driven fetch + zip extract for benchmark datasets:

    python -m cordon_spark.download DATASET [--force] [--manifest PATH]
    python -m cordon_spark.download --list

The manifest is the same YAML shape the evaluation harness reads
(`datasets:` map of id -> {name, url, log_file, labels_file,
extract_to, total_lines, anomaly_rate}). `requests` is import-gated —
this sandbox has no network — exactly like the remote-embedding
backend (functions/embeddings.py); tests exercise the full
download/extract path with a mocked session.
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

DEFAULT_MANIFEST = "benchmark/datasets.yaml"


def load_manifest(manifest_path: str = DEFAULT_MANIFEST) -> dict:
    """Load the datasets manifest (reference download.py:12-15)."""
    import yaml

    with open(manifest_path) as fh:
        return yaml.safe_load(fh)


def download_dataset(
    dataset_id: str,
    force: bool = False,
    manifest_path: str = DEFAULT_MANIFEST,
    http_get=None,
) -> Path:
    """Download and extract one dataset (reference download.py:18-79).

    Skips the fetch when both `log_file` and `labels_file` already exist
    under `extract_to` (unless `force`); otherwise streams the zip,
    reports progress, and extracts in place. `http_get` injects the
    transport for tests; the default requires `requests`.
    """
    manifest = load_manifest(manifest_path)
    datasets = manifest.get("datasets", {})
    if dataset_id not in datasets:
        available = ", ".join(datasets.keys())
        raise ValueError(f"Unknown dataset '{dataset_id}'. Available: {available}")

    dataset = datasets[dataset_id]
    extract_path = Path(dataset["extract_to"])
    log_file = extract_path / dataset["log_file"]
    labels_file = extract_path / dataset["labels_file"]

    if log_file.exists() and labels_file.exists() and not force:
        print(f"Dataset '{dataset['name']}' already exists at {extract_path}")
        print("Use --force to re-download")
        return extract_path

    extract_path.parent.mkdir(parents=True, exist_ok=True)

    print(f"Downloading {dataset['name']} from {dataset['url']}...")
    print("  (This may take a few minutes)")

    if http_get is None:
        try:
            import requests
        except ImportError as exc:  # pragma: no cover - requests absent here
            raise RuntimeError(
                "requests is required to download datasets; "
                "install the [benchmark] extra"
            ) from exc
        http_get = lambda url: requests.get(url, stream=True)  # noqa: E731

    response = http_get(dataset["url"])
    response.raise_for_status()

    total_size = int(response.headers.get("content-length", 0))
    downloaded = 0
    # stream to a spooled temp file (spills to disk past 32 MB) so a
    # multi-GB archive never has to fit in RAM
    with tempfile.SpooledTemporaryFile(max_size=32 * 1024 * 1024) as buf:
        for chunk in response.iter_content(chunk_size=8192):
            if chunk:
                buf.write(chunk)
                downloaded += len(chunk)
                if total_size > 0:
                    pct = (downloaded / total_size) * 100
                    print(
                        f"\r  Downloaded: {downloaded / 1024 / 1024:.1f} MB ({pct:.1f}%)",
                        end="",
                    )
        print()

        print(f"Extracting to {extract_path}...")
        buf.seek(0)
        with zipfile.ZipFile(buf) as z:
            z.extractall(extract_path)

    print(f"Dataset '{dataset['name']}' ready at {extract_path}")
    return extract_path


def main(argv: list[str] | None = None) -> int:
    """CLI for dataset management (reference download.py:82-103)."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="cordon-spark-download", description="Download benchmark datasets"
    )
    parser.add_argument("dataset", nargs="?", help="Dataset ID (e.g., 'hdfs_v1')")
    parser.add_argument("--force", action="store_true", help="Force re-download")
    parser.add_argument("--list", action="store_true", help="List available datasets")
    parser.add_argument("--manifest", default=DEFAULT_MANIFEST,
                        help="YAML dataset manifest path")
    args = parser.parse_args(argv)

    if args.list:
        manifest = load_manifest(args.manifest)
        print("Available datasets:")
        for dataset_id, info in manifest.get("datasets", {}).items():
            print(f"  {dataset_id}: {info['name']}")
            if "total_lines" in info:
                print(f"    Lines: {info['total_lines']:,}")
            if "anomaly_rate" in info:
                print(f"    Anomaly rate: {info['anomaly_rate']:.2%}")
        return 0

    if not args.dataset:
        parser.error("dataset is required unless --list is given")
    try:
        download_dataset(args.dataset, force=args.force, manifest_path=args.manifest)
    except (ValueError, OSError, RuntimeError) as exc:
        print(f"error: {exc}")
        return 1
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
