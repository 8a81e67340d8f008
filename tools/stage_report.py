#!/usr/bin/env python3
"""Summarize a Spark event log: per-job (description) and per-stage wall,
task count, max/median task time, input/shuffle bytes. Usage:
  python3 tools/stage_report.py <eventlog-file> [job-desc-filter]
"""
import json, sys, collections

path = sys.argv[1]
filt = sys.argv[2] if len(sys.argv) > 2 else None

stages = {}          # stageId -> dict
stage_tasks = collections.defaultdict(list)
jobs = {}            # jobId -> (desc, [stageIds], t_start, t_end)

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            jobs[e["Job ID"]] = {
                "desc": desc,
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                "t0": e.get("Submission Time", 0), "t1": None}
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e.get("Completion Time", 0)
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "t0": si.get("Submission Time", 0),
                "t1": si.get("Completion Time", 0),
                "n": si.get("Number of Tasks", 0)}
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e.get("Task Info", {})
            tm = e.get("Task Metrics") or {}
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            inp = (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
            sr = (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + \
                 (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            sw = (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
            stage_tasks[sid].append((dur, inp, sr, sw))

def med(xs):
    xs = sorted(xs)
    return xs[len(xs)//2] if xs else 0

for jid in sorted(jobs):
    j = jobs[jid]
    if filt and filt not in j["desc"]:
        continue
    wall = (j["t1"] or 0) - j["t0"]
    print(f"== job {jid} wall={wall/1000:.3f}s  desc={j['desc'][:90]}")
    for sid in sorted(j["stages"]):
        if sid not in stages:
            continue  # skipped stage
        s = stages[sid]
        ts = stage_tasks.get(sid, [])
        durs = [t[0] for t in ts]
        print(f"   stage {sid:4d} wall={(s['t1']-s['t0'])/1000:7.3f}s "
              f"tasks={len(ts):3d} max={max(durs or [0])/1000:7.3f}s "
              f"med={med(durs)/1000:7.3f}s "
              f"in={sum(t[1] for t in ts)/1e6:8.1f}MB "
              f"sr={sum(t[2] for t in ts)/1e6:7.1f}MB "
              f"sw={sum(t[3] for t in ts)/1e6:7.1f}MB  {s['name'][:60]}")
