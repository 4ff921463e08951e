"""Raw object sink (S4; reference parity: the single-object S3 put of
``owner.txt`` + storage-location claim,
/root/reference/src/copy_from_template.py:316-327).

Driver-side control-plane IO, not a DataFrame op: the engine occasionally
writes marker/manifest objects (bucket-claim tokens, _SUCCESS-style
sentinels) next to its datasets. S3 is used when boto3 + credentials exist;
otherwise the same call targets the local filesystem so pipelines stay
runnable in hermetic environments.
"""

from __future__ import annotations

import os

try:
    import boto3
except ImportError:  # pragma: no cover
    boto3 = None


def put_object(bucket_or_dir: str, key: str, body: bytes) -> str:
    """Write ``body`` at ``key`` under an s3:// bucket or a local directory;
    returns the full target path/URI."""
    if bucket_or_dir.startswith("s3://"):
        if boto3 is None:
            raise ImportError("boto3 required for s3:// targets")
        bucket = bucket_or_dir[len("s3://") :].rstrip("/")
        boto3.client("s3").put_object(Bucket=bucket, Key=key, Body=body)
        return f"s3://{bucket}/{key}"
    target = os.path.join(bucket_or_dir, key)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    with open(target, "wb") as f:
        f.write(body)
    return target


def claim_marker(base: str, app: str, study: str, principal: str) -> str:
    """The owner.txt pattern: a claim token at the dataset's base prefix
    (``bridge-downstream/{app}/{study}/owner.txt``)."""
    return put_object(base, f"bridge-downstream/{app}/{study}/owner.txt", principal.encode())
