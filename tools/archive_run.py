import json, shutil, sys, os
for name in sys.argv[1:]:
    src = f"saved_runs/{name}"
    if not os.path.isdir(src):
        print("missing:", name); continue
    out = f"docs/runs/{name}.nashconv.jsonl"
    n = 0
    with open(out, "w") as f:
        for line in open(f"{src}/metrics.jsonl"):
            d = json.loads(line)
            if "nashconv" in d:
                f.write(json.dumps({"step": d["step"],
                                    "nashconv": d["nashconv"]}) + "\n")
                n += 1
    shutil.copy(f"{src}/params.json", f"docs/runs/{name}.params.json")
    if os.path.exists(f"{src}/best.json"):
        shutil.copy(f"{src}/best.json", f"docs/runs/{name}.best.json")
    print(name, n, "eval rows archived")
