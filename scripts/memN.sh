#!/bin/bash
N=$1
d=$(mktemp -d)
for i in $(seq 0 $((N-1))); do
  taskset -c $i python3 -c "
import numpy, time
a = numpy.arange(32 * 1024 * 1024, dtype=numpy.int64)  # 256 MiB
t0 = time.time(); n = 0
while time.time() - t0 < 6.0:
    s = a.sum(); n += 1
print(n)
" > $d/$i &
done
wait
python3 -c "
import glob
ls=[int(open(f).read()) for f in glob.glob('$d/*')]
print('sum=%d n=%d min=%d max=%d' % (sum(ls), len(ls), min(ls), max(ls)))"
rm -rf $d
