#!/usr/bin/env python
"""Live-infrastructure harness for the serving-tier integration tests.

The engine's only SURVEY §2 rows without in-sandbox execution evidence
are the live connector paths (G3 Kafka source, G4 Cassandra LWT sink,
R5-R8 atomic CAS + SERIAL read): the build sandbox has a docker CLIENT
but no reachable daemon (`docker info` -> cannot connect, verified
round 10), no `cassandra-driver` wheel, and no spark-sql-kafka jar.
This script is the bring-up half of the testcontainers-style protocol;
tests/test_integration_live.py is the assertion half and SKIPS cleanly
(with the reason printed) anywhere the endpoints are absent, exactly
like the existing broker-jar skip.

Protocol (any machine with a docker daemon):

    # 1. bring up the backends (waits until healthy, prints exports)
    python scripts/live_harness.py up

    # 2. run the gated tests with the printed env + required deps:
    #    pip install cassandra-driver
    #    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:\
    #        spark-sql-kafka-0-10_2.13:4.0.0 pyspark-shell"
    KCP_CASSANDRA_CONTACT_POINTS=127.0.0.1 \
    KCP_KAFKA_BOOTSTRAP=127.0.0.1:9092 \
        python -m pytest tests/test_integration_live.py -v

    # 3. evidence lands in artifacts/live_integration.json (the
    #    recorded-artifact protocol: each passing test appends one
    #    JSON object with the statements executed, LWT applied flags,
    #    SERIAL-read values and round-trip counts, so a reviewer can
    #    audit a run performed elsewhere).  Tear down:
    python scripts/live_harness.py down

Container choices: cassandra:5 (Paxos v2 default on) and apache/kafka
(KRaft single node) - both official images, no compose file needed.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

CASSANDRA = ("kcp-live-cassandra", ["docker", "run", "-d", "--name",
             "kcp-live-cassandra", "-p", "9042:9042", "cassandra:5"])
KAFKA = ("kcp-live-kafka", ["docker", "run", "-d", "--name",
         "kcp-live-kafka", "-p", "9092:9092", "apache/kafka:3.9.0"])


def _run(cmd: list[str], check: bool = True) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, check=check)


def daemon_up() -> bool:
    try:
        return _run(["docker", "info"], check=False).returncode == 0
    except FileNotFoundError:
        return False


def wait_cassandra(name: str, timeout_s: float = 180.0) -> None:
    """Poll `cqlsh -e 'describe cluster'` inside the container: the
    gossip/native-transport startup takes ~60-90 s on a cold image."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        r = _run(["docker", "exec", name, "cqlsh", "-e", "describe cluster"],
                 check=False)
        if r.returncode == 0:
            return
        time.sleep(3)
    raise TimeoutError(f"{name}: CQL not ready after {timeout_s}s")


def wait_kafka(name: str, timeout_s: float = 120.0) -> None:
    deadline = time.time() + timeout_s
    probe = ["docker", "exec", name, "/opt/kafka/bin/kafka-topics.sh",
             "--bootstrap-server", "localhost:9092", "--list"]
    while time.time() < deadline:
        if _run(probe, check=False).returncode == 0:
            return
        time.sleep(3)
    raise TimeoutError(f"{name}: broker not ready after {timeout_s}s")


def up() -> int:
    if not daemon_up():
        print("docker daemon not reachable - cannot bring up live "
              "backends here; run this on a docker-capable host",
              file=sys.stderr)
        return 2
    for name, cmd in (CASSANDRA, KAFKA):
        _run(["docker", "rm", "-f", name], check=False)
        _run(cmd)
    wait_cassandra(CASSANDRA[0])
    wait_kafka(KAFKA[0])
    print("export KCP_CASSANDRA_CONTACT_POINTS=127.0.0.1")
    print("export KCP_KAFKA_BOOTSTRAP=127.0.0.1:9092")
    return 0


def down() -> int:
    for name, _ in (CASSANDRA, KAFKA):
        _run(["docker", "rm", "-f", name], check=False)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["up", "down"])
    sys.exit(up() if ap.parse_args().action == "up" else down())
