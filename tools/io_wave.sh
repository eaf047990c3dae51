#!/bin/bash
# Induced host-I/O wave for bench-hardening evidence (round 9): loops
# fsync'd 1 GiB writes to the disk-backed /tmp until killed, emulating
# the external I/O waves that inflated checkpoint-heavy streaming legs
# ~6x in round 8 (s26 3.9 -> 24.1 s on identical code). Run alongside a
# full Bench to demonstrate rc=0 with memory-backed scratch.
while :; do
  dd if=/dev/zero of=/tmp/io_wave.bin bs=1M count=1024 conv=fsync 2>/dev/null
  sync
done
