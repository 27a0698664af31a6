"""Two-process 'multi-host' run on CPU: each process owns half the capture's
chunks, the sharded front-end runs over the global mesh, results must equal
the sequential stream. This is the CI stand-in for a 2-host pod slice
(SURVEY §4d)."""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from directdemod_tpu.models.frontend import DdcFm
from directdemod_tpu.ops import design, resample as rs
from directdemod_tpu.parallel import distributed
from directdemod_tpu.parallel.sharded import ShardedDdcFm

FS = 2048000
L = 100_000
N_CHUNKS = 8
rng = np.random.default_rng(11)
t = np.arange(N_CHUNKS * L) / FS
x = (np.exp(1j*(2*np.pi*30000*t + 3*np.sin(2*np.pi*400*t)))
     + 0.1*(rng.standard_normal(len(t)) + 1j*rng.standard_normal(len(t)))
     ).astype(np.complex64)

fe = DdcFm(FS, 30000, design.blackmanharris(151), 60000, fm=True)
mesh = jax.make_mesh((8,), ("time",), devices=jax.devices())
sh = ShardedDdcFm(fe, mesh)          # the PRODUCTION sharded front-end

# each process owns half the chunks
my = slice(pid * 4, pid * 4 + 4)
local = np.stack([x[i*L:(i+1)*L] for i in range(N_CHUNKS)])[my]
chunks = distributed.global_wave(mesh, local)
gidx = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("time")),
    np.arange(N_CHUNKS, dtype=np.int32)[my])

# run the production wave kernel verbatim (halo ppermute + closed-form
# phases); the carried tail is the virtual all-ones NCO history for chunk 0
y = sh._wave(chunks, gidx, np.asarray(sh.hist0_ext, np.complex64))
rows = sorted(y.addressable_shards, key=lambda sh: sh.index[0].start or 0)
out_rows = [np.asarray(sh.data).reshape(-1, np.asarray(sh.data).shape[-1])
            for sh in rows]
out_rows = np.concatenate(out_rows, axis=0)          # (4, m_max) in chunk order

# sequential reference on this process's chunks
from directdemod_tpu.io.sources import ArraySource
ref_full, _ = fe.process(ArraySource(x, FS), block_size=L, dtype=jnp.complex64)
# reassemble this process's span (chunk 0 drops one sample)
lens = [rs.decim_count(L, rs.decim_phase(i*L, fe.stride), fe.stride) - (1 if i == 0 else 0)
        for i in range(N_CHUNKS)]
starts = np.cumsum([0] + lens)
mine = []
got_rows = []
for local_i, g in enumerate(range(my.start, my.stop)):
    off = rs.decim_phase(g*L, fe.stride)
    cnt = rs.decim_count(L, off, fe.stride)
    row = out_rows[local_i][:cnt]
    if g == 0:
        row = row[1:]          # first stream output has no discriminator pair
    got_rows.append(row)
    mine.append(ref_full[starts[g]:starts[g+1]])
got = np.concatenate(got_rows)
ref_mine = np.concatenate(mine)
err = np.max(np.abs(got - ref_mine))
assert err < 2e-3, err
print(f"proc {pid}: OK err={err:.2e}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_run(tmp_path):
    port = "12355"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out


_NOAA_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
from apt_synth import synthesize, FS
from directdemod_tpu.io.sources import ArraySource
from directdemod_tpu.models.noaa import NoaaDecoder
from directdemod_tpu.parallel.mesh import make_mesh

iq, _ = synthesize(n_lines=12, snr_db=20)
mesh = make_mesh(time=2 * 4, channel=1)     # 2 processes x 4 devices
dec = NoaaDecoder(ArraySource(iq, FS), 30000, mesh=mesh)
img = dec.get_image()
sa, sb = dec.get_crude_sync()
assert dec.useful == 1

if pid == 0:
    ref = NoaaDecoder(ArraySource(iq, FS), 30000)    # sequential, no mesh
    rimg = ref.get_image()
    rsa, rsb = ref.get_crude_sync()
    assert np.array_equal(np.asarray(sa), np.asarray(rsa))
    assert np.array_equal(np.asarray(sb), np.asarray(rsb))
    assert img.shape == rimg.shape
    same = float(np.mean(img == rimg))
    assert same > 0.999, same
    assert np.max(np.abs(img.astype(int) - rimg.astype(int))) <= 1
print(f"proc {pid}: NOAA OK shape={img.shape}", flush=True)
"""


@pytest.mark.slow
def test_two_process_full_noaa_decode(tmp_path):
    """Full NOAA decode over a 2-process x 4-device global mesh (sharded
    front end, sharded sync search, sharded image filtfilt/envelope): the
    image must equal the sequential single-process decode. This is the
    multi-host production shape on the CPU CI stand-in (SURVEY 5.8)."""
    port = "12356"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    script = tmp_path / "worker_noaa.py"
    script.write_text(_NOAA_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: NOAA OK" in out
