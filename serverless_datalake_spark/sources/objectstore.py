"""Object-store publish primitive for the txlog commit protocol.

txlog._commit publishes a log entry via atomic create-if-absent
(os.link). On an object store there is no rename/link; the equivalent
primitive is a CONDITIONAL PUT — `PutObject` with `If-None-Match: *`,
which S3 supports natively (announced 2024-08; MinIO, GCS XML API and
most S3-compatibles honor the same header). HTTP semantics (RFC 9110
§13.1.2): the PUT succeeds only if no representation exists; a racing
loser gets **412 Precondition Failed**, which maps 1:1 onto the local
path's EEXIST — the lost race that triggers retry-against-new-head.

This module is stdlib-only (urllib; boto3 is deliberately NOT a
dependency) so the primitive is testable in-process:
tests/test_objectstore_commit.py races N writers through
`commit_with_retry` against an HTTP endpoint implementing the
documented If-None-Match semantics and asserts the txlog invariants
(dense versions, no lost update, loser always re-reads the new head).
Against real S3, point the URL at
`https://<bucket>.s3.<region>.amazonaws.com/<table>/_txlog/` with a
signing opener; the protocol below is unchanged.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


class CommitConflict(Exception):
    """The conditional PUT lost the race (HTTP 412): another committer
    published this version first. Retry against the new head."""


def put_if_absent(url: str, body: bytes, opener=None, timeout: float = 10.0) -> None:
    """PUT `body` at `url` with `If-None-Match: *`.

    Raises CommitConflict on 412 (the object already exists — the
    txlog lost-race signal); propagates anything else. The server —
    S3, MinIO, or the test harness — is the arbiter of atomicity:
    exactly one concurrent PUT per key can succeed, all others 412.
    """
    req = urllib.request.Request(
        url,
        data=body,
        method="PUT",
        headers={
            "If-None-Match": "*",
            "Content-Type": "application/json",
        },
    )
    send = (opener or urllib.request.build_opener()).open
    try:
        with send(req, timeout=timeout):
            return
    except urllib.error.HTTPError as exc:
        if exc.code == 412:
            raise CommitConflict(url) from None
        raise


def get_json(url: str, opener=None, timeout: float = 10.0):
    """GET a JSON object, or None on 404 (absent key)."""
    send = (opener or urllib.request.build_opener()).open
    try:
        with send(url, timeout=timeout) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        if exc.code == 404:
            return None
        raise


def commit_with_retry(
    base_url: str,
    entry: dict,
    start_version: int = 0,
    max_attempts: int = 1000,
    opener=None,
) -> int:
    """Optimistic-concurrency commit loop — txlog._commit's protocol
    with put_if_absent as the publish primitive.

    Try to publish `entry` at `start_version`; on CommitConflict
    (another committer owns that version) advance past the observed
    head and retry. Returns the version actually committed. The entry
    is re-stamped with its final version so a log replay can verify
    name/content agreement (the local txlog stores version inside the
    entry too).

    The retry re-READS the conflicting head entry before advancing —
    against a real table the loser must rebase its adds/removes on the
    winner's (conflict detection); here the hook point is `rebase`
    in the entry dict, which tests use to assert the loser actually
    observed the winner.
    """
    version = start_version
    for _ in range(max_attempts):
        entry = dict(entry, version=version)
        url = f"{base_url.rstrip('/')}/{version:08d}.json"
        try:
            put_if_absent(url, json.dumps(entry).encode(), opener=opener)
            return version
        except CommitConflict:
            head = get_json(url, opener=opener)
            if head is not None:
                # observed the winner: the rebase hook records it so a
                # test (or a real conflict checker) can prove the loser
                # saw the state it must reconcile against
                entry = dict(entry, rebased_on=head.get("version", version))
            version += 1
    raise RuntimeError(f"commit_with_retry exhausted {max_attempts} attempts")
