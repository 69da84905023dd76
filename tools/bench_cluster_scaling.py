"""TRUE multi-executor scaling evidence: N -> 4N separate executor JVMs on
a Spark standalone cluster, same input, same epoch job as bench_scaling.py.

Why this exists: the north rule asks for throughput scaling efficiency
>= 0.8 between N and 4N EXECUTORS. bench_scaling.py evidences that with
pinned local-mode JVMs (one JVM per level, cpuset = core budget), which
isolates the engine's scaling but cannot show the multi-JVM dimension —
and BASELINE.md documents that a SINGLE local-mode JVM saturates its shared
scheduler/shuffle locks near 8-16 busy cores. This tool removes that
asterisk: it boots a real standalone cluster on this box (1 master + 4
workers, each worker pinned to its own cpuset like a real executor's
cgroup; default 2-core, WCS_WORKER_CPUSETS overrides — e.g.
"0-3,4-7,8-11,12-15" for 4-core executors), then runs the IDENTICAL epoch
job via spark-submit at
  N  = --total-executor-cores EXEC_CORES      (1 executor JVM)
  4N = --total-executor-cores 4*EXEC_CORES    (4 executor JVMs)
so the 4N level exercises real executor-to-executor shuffle over separate
JVM heaps and python-worker pools. The job body is bench_scaling.run_epoch
— byte-identical input, same bucketed fetch join, same Arrow parse UDF.

The driver and master are pinned to cores 24-31 at BOTH levels so their
capacity is constant and only executor capacity varies. The same mp.Pool
machine control as bench_scaling runs on the executor cpusets and is
embedded in the output JSON.

Usage:
    python tools/bench_cluster_scaling.py          # full protocol -> JSON
    SCALING_N_DOCS=960000 SCALING_REPEATS=2 python tools/bench_cluster_scaling.py
(worker mode — internal, launched via spark-submit:
    tools/bench_cluster_scaling.py --worker WORKDIR TOTAL_CORES)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_HOST = "127.0.0.1"
MASTER_PORT = int(os.environ.get("WCS_CLUSTER_PORT", "7077"))
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"
MASTER_WEBUI = int(os.environ.get("WCS_CLUSTER_WEBUI", "8090"))
#: one cpuset per worker = one real executor's core budget (like a cgroup).
#: Default 4 x 2-core; override e.g. WCS_WORKER_CPUSETS="0-3,4-7,8-11,12-15"
#: for 4-core executors (EXEC_CORES and LEVELS derive from the cpusets:
#: levels are always 1 executor vs all executors = N -> 4N).
WORKER_CPUSETS = os.environ.get(
    "WCS_WORKER_CPUSETS", "0-1,2-3,4-5,6-7").split(",")
#: executor core budget; defaults to the cpuset width. WCS_EXEC_CORES
#: decouples them for diagnostics (e.g. 4 x 2-core executors all floating
#: on a shared "0-7" cpuset isolates cpuset FRAGMENTATION from JVM count).
EXEC_CORES = int(os.environ.get("WCS_EXEC_CORES", "0")) or (
    lambda s: int(s.split("-")[1]) - int(s.split("-")[0]) + 1)(
    WORKER_CPUSETS[0])
DRIVER_CPUSET = "24-31"                        # constant across levels
LEVELS = (EXEC_CORES, EXEC_CORES * len(WORKER_CPUSETS))
#: extra spark confs for experiments, "k=v;k=v"
EXTRA_CONF = [x for kv in os.environ.get("WCS_EXTRA_CONF", "").split(";")
              if kv for x in ("--conf", kv)]


def _launch(args: list, cpuset: str, logfile: str) -> subprocess.Popen:
    with open(logfile, "w") as lf:
        return subprocess.Popen(["taskset", "-c", cpuset,
                                 f"{SPARK_HOME}/bin/spark-class"] + args,
                                stdout=lf, stderr=subprocess.STDOUT)


def _alive_workers() -> int:
    try:
        with urllib.request.urlopen(
                f"http://{MASTER_HOST}:{MASTER_WEBUI}/json", timeout=5) as r:
            d = json.loads(r.read())
        return sum(1 for w in d.get("workers", [])
                   if w.get("state") == "ALIVE")
    except Exception:
        return -1


def start_cluster(logdir: str) -> list:
    procs = [_launch(["org.apache.spark.deploy.master.Master",
                      "--host", MASTER_HOST, "--port", str(MASTER_PORT),
                      "--webui-port", str(MASTER_WEBUI)],
                     DRIVER_CPUSET, os.path.join(logdir, "master.log"))]
    deadline = time.time() + 60
    while _alive_workers() < 0:
        if time.time() > deadline:
            raise RuntimeError("standalone master did not come up")
        time.sleep(1)
    for i, cpuset in enumerate(WORKER_CPUSETS):
        procs.append(_launch(
            ["org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--host", MASTER_HOST, "--cores", str(EXEC_CORES),
             "--memory", "12g",
             "--webui-port", str(MASTER_WEBUI + 1 + i)],
            cpuset, os.path.join(logdir, f"worker{i}.log")))
    deadline = time.time() + 120
    while _alive_workers() < len(WORKER_CPUSETS):
        if time.time() > deadline:
            raise RuntimeError(
                f"only {_alive_workers()} workers registered")
        time.sleep(1)
    return procs


def stop_cluster(procs: list) -> None:
    for p in reversed(procs):
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except Exception:
            p.kill()


def _submit(workdir: str, zip_path: str, total_cores: int) -> dict:
    conf = [
        "--conf", f"spark.sql.shuffle.partitions={2 * total_cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.files.maxPartitionBytes=4m",
        "--conf", "spark.sql.files.openCostInBytes=262144",
        "--conf", f"spark.sql.autoBroadcastJoinThreshold={64 * 1024 * 1024}",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        # local-FS splits carry no locality prefs, but SHUFFLE stages do:
        # with 4 executors the default 3s locality wait stalls reduce tasks
        # that aren't process-local to their map output; 1 executor never
        # waits (everything is process-local), so the default penalizes ONLY
        # the 4N level. Scheduling delay is not the quantity under test.
        "--conf", "spark.locality.wait=0s",
    ] + EXTRA_CONF
    p = subprocess.run(
        ["taskset", "-c", DRIVER_CPUSET,
         f"{SPARK_HOME}/bin/spark-submit", "--master", MASTER_URL,
         "--total-executor-cores", str(total_cores),
         "--executor-cores", str(EXEC_CORES),
         "--executor-memory", "10g",
         "--driver-memory", "8g", "--py-files", zip_path] + conf +
        [os.path.abspath(__file__), "--worker", workdir, str(total_cores)],
        capture_output=True, text=True, timeout=3600)
    if p.returncode != 0:
        print(p.stderr[-4000:], file=sys.stderr)
        sys.exit(1)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def cluster_worker(workdir: str, total_cores: int) -> None:
    """Runs INSIDE spark-submit against the standalone master."""
    from pyspark.sql import SparkSession

    import tools.bench_scaling as bs

    spark = SparkSession.builder.appName(
        f"cluster-scaling-{total_cores}").getOrCreate()
    res = bs.run_epoch(spark, workdir, total_cores)
    res["executors"] = total_cores // EXEC_CORES
    print(json.dumps(res))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        cluster_worker(sys.argv[2], int(sys.argv[3]))
        return

    import tools.bench_scaling as bs

    workdir = tempfile.mkdtemp(prefix="wcs-cluster-scaling-")
    logdir = os.path.join(workdir, "logs")
    os.makedirs(logdir)
    zip_path = os.path.join(workdir, "wcs.zip")
    subprocess.run(["zip", "-qr", zip_path, "web_crawler_spark"],
                   cwd=REPO, check=True)
    procs = []
    try:
        print(f"# preparing shared input ({bs.N_DOCS} docs) in {workdir}",
              file=sys.stderr)
        bs.prepare(workdir)
        print("# starting standalone cluster: 1 master + "
              f"{len(WORKER_CPUSETS)} pinned {EXEC_CORES}-core workers",
              file=sys.stderr)
        procs = start_cluster(logdir)
        repeats = int(os.environ.get("SCALING_REPEATS", "2"))
        results = {}
        for r in range(repeats):
            for cores in LEVELS:
                print(f"# spark-submit total-executor-cores={cores} "
                      f"(round {r + 1}/{repeats}) ...", file=sys.stderr)
                res = _submit(workdir, zip_path, cores)
                print(f"#   {res}", file=sys.stderr)
                if (cores not in results or
                        res["urls_per_sec"] > results[cores]["urls_per_sec"]):
                    results[cores] = res
        lo, hi = LEVELS
        ups_lo = results[lo]["urls_per_sec"]
        ups_hi = results[hi]["urls_per_sec"]
        ratio = hi / lo
        mp_lo = max(bs._mp_control(lo) for _ in range(2))
        mp_hi = max(bs._mp_control(hi) for _ in range(2))
        machine_eff = round(mp_hi / (ratio * mp_lo), 3)
        eff = round(ups_hi / (ratio * ups_lo), 3)
        out = {
            "metric": "cluster_scaling_efficiency_N_to_4N_executors",
            "value": eff,
            "unit": "ratio",
            "n_docs": bs.N_DOCS,
            "n_hosts": bs.N_HOSTS,
            "executors_lo": 1, "executors_hi": len(WORKER_CPUSETS),
            "executor_cores": EXEC_CORES,
            f"exec{lo}": results[lo],
            f"exec{hi}": results[hi],
            "machine_control_docs_per_sec": {str(lo): round(mp_lo),
                                             str(hi): round(mp_hi)},
            "machine_scaling_efficiency": machine_eff,
            "normalized_efficiency_vs_machine": round(eff / machine_eff, 3),
        }
        print(json.dumps(out))
    finally:
        stop_cluster(procs)
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
