#!/bin/bash
# Interleaved bench.py A/B: DX_WIDE_CODEC=off (stock) vs auto (zstd at 32
# cores) at sf0.1 local[32]. Guards the adopted wide-codec default against
# regressing the small-query driver bench (AB_CODEC.json only measured the
# big replay). 3 pairs, alternating, one line of JSON per run.
set -u
OUT=BENCH/ab_bench_codec.jsonl
: > "$OUT"
for pair in 1 2 3; do
  for mode in off auto; do
    echo "pair $pair mode $mode $(date -u +%H:%M:%S)" >&2
    line=$(DX_WIDE_CODEC=$mode python bench.py 2>/dev/null)
    echo "{\"pair\": $pair, \"mode\": \"$mode\", \"result\": $line}" >> "$OUT"
  done
done
echo DONE >&2
