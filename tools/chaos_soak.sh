#!/bin/bash
# Chaos soak for the cross-process write-coordination stack: one writer
# committing flat out (follower adoption ON), two follower processes
# pushing batches through inbox adoption, and the writer SIGKILLed and
# restarted three times at random points (mid-commit, mid-adoption,
# mid-Spark-startup — followers then step up through the lease steal).
#
# Invariants validated at the end (exit 1 on violation):
#   - every ACKED follower batch is present EXACTLY once (no loss, no
#     duplication; acked = the FWD_COMMITTED line was printed)
#   - at most one spooled-but-unacked batch per follower may also be
#     present (an ack can die with its writer after the publish won)
#   - every surviving writer batch is whole
#   - followers finish all batches (no spurious refusals — the soak found
#     a real one: a stopping adopter turning its own shutdown into a
#     schema-refusal verdict for an innocent follower)
#
# Usage: tools/chaos_soak.sh   (run from the repo root, classes compiled)
set -u
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
WH=$(mktemp -d /tmp/graft-chaos.XXXX)
LOGD=$(mktemp -d /tmp/graft-chaos-logs.XXXX)
echo "warehouse $WH, logs $LOGD"
start_writer() {
  java $AO -Xmx3g -Dspark.ui.enabled=false \
    -Dspark.graft.followerInserts=true \
    -cp "$CP" graft.CrashWriter "$WH" 500 1000 >> "$LOGD/writer.log" 2>&1 &
  WPID=$!
}
start_writer
sleep 18
java $AO -Xmx2g -Dspark.ui.enabled=false -cp "$CP" \
  graft.FollowerWriter "$WH" -41 25 400 >> "$LOGD/f1.log" 2>&1 &
F1=$!
java $AO -Xmx2g -Dspark.ui.enabled=false -cp "$CP" \
  graft.FollowerWriter "$WH" -42 25 400 >> "$LOGD/f2.log" 2>&1 &
F2=$!
for i in 1 2 3; do
  sleep $((6 + RANDOM % 5))
  kill -9 $WPID 2>/dev/null
  echo "killed writer round $i"
  sleep $((1 + RANDOM % 3))
  start_writer
done
wait $F1 $F2
kill -9 $WPID 2>/dev/null
python3 - "$WH" "$LOGD" <<'EOF'
import duckdb, glob, json, re, sys
WH, LOGD = sys.argv[1], sys.argv[2]
cats = sorted(glob.glob(WH + '/_catalog.v*.json'),
              key=lambda p: int(re.search(r'v(\d+)\.json', p).group(1)))
d = json.load(open(cats[-1]))
v = d['versions']['crash_t']
alias = d.get('dirAliases', {}).get(f'crash_t/{v}')
vdir = WH + '/crash_t/' + (alias if alias else f'v{v}')
con = duckdb.connect()
bad = []
for tag, log in ((-41, 'f1.log'), (-42, 'f2.log')):
    lines = open(f'{LOGD}/{log}').read()
    acked = set(int(m.group(1)) for m in
                re.finditer(rf'FWD_COMMITTED {tag} (\d+)', lines))
    per = dict(con.execute(
        f"select (k - ({tag})*1000000)//10000 b, count(*) "
        f"from parquet_scan('{vdir}/**/*.parquet') where b={tag} "
        "group by 1").fetchall())
    if not all(c == 400 for c in per.values()):
        bad.append(f'tag {tag}: partial batch {per}')
    if not acked <= set(per):
        bad.append(f'tag {tag}: acked batches lost: {acked - set(per)}')
    extras = set(per) - acked
    if len(extras) > 1:
        bad.append(f'tag {tag}: too many unacked batches survive: {extras}')
    if len(acked) < 25 and 'FWD_DONE' not in lines:
        bad.append(f'tag {tag}: follower failed after {len(acked)} acks '
                   f'(see {LOGD}/{log})')
    print(f'tag {tag}: acked={len(acked)} present={len(per)} whole=400 ok')
wb = con.execute(f"select b, count(*) from parquet_scan('{vdir}/**/*.parquet') "
                 "where b >= 0 group by b").fetchall()
if not all(c == 500 for _, c in wb):
    bad.append(f'writer: partial batch among {wb}')
print(f'writer: {len(wb)} whole batches')
dups = con.execute(f"select k, count(*) c from parquet_scan('{vdir}/**/*.parquet') "
                   "group by k having count(*) > 1 limit 3").fetchall()
if dups:
    bad.append(f'duplicate keys: {dups}')
if bad:
    print('SOAK FAILED:'); [print(' -', b) for b in bad]; sys.exit(1)
print('SOAK OK')
EOF
rc=$?
[ $rc -eq 0 ] && rm -rf "$WH" "$LOGD"
exit $rc
