"""CLI + serialisation tests, modelled on the reference's cli_test.py strategy:

in-process click CliRunner, tempfile keyfiles, 256-bit keys for speed
(phe/tests/cli_test.py:26), full encrypt/decrypt/add/addenc/multiply
pipelines — plus cross-tool wire-format parity with the actual reference
CLI (our encrypt -> their decrypt and vice versa), and the batch-vector
commands unique to this framework.
"""

import json
import sys

import pytest

click = pytest.importorskip("click")
from click.testing import CliRunner

import phe_tpu
from phe_tpu import serial
from phe_tpu.cli import cli

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
try:
    from phe import command_line as ref_cli
except ImportError:
    ref_cli = None


@pytest.fixture(scope="module")
def keyfiles(tmp_path_factory):
    """One 256-bit keypair written as private + public JWK files."""
    d = tmp_path_factory.mktemp("keys")
    runner = CliRunner()
    priv_file = d / "priv.json"
    pub_file = d / "pub.json"
    r = runner.invoke(
        cli, ["genpkey", "--keysize", "256", str(priv_file)]
    )
    assert r.exit_code == 0, r.output
    r = runner.invoke(cli, ["extract", str(priv_file), str(pub_file)])
    assert r.exit_code == 0, r.output
    return d, priv_file, pub_file


class TestKeyFormats:
    def test_private_jwk_shape(self, keyfiles):
        _, priv_file, _ = keyfiles
        data = json.loads(priv_file.read_text())
        assert data["kty"] == "DAJ"
        assert data["key_ops"] == ["decrypt"]
        assert "p" in data and "q" in data
        assert data["pub"]["alg"] == "PAI-GN1"
        assert data["pub"]["key_ops"] == ["encrypt"]

    def test_jwk_roundtrip(self, keyfiles):
        _, priv_file, _ = keyfiles
        priv = serial.private_key_from_jwk(json.loads(priv_file.read_text()))
        again = serial.private_key_from_jwk(serial.private_key_to_jwk(priv))
        assert again == priv

    def test_keysize(self, keyfiles):
        _, priv_file, _ = keyfiles
        priv = serial.private_key_from_jwk(json.loads(priv_file.read_text()))
        assert priv.public_key.n.bit_length() == 256


class TestEncryptDecryptCli:
    @pytest.mark.parametrize(
        "value", ["5", "3.1415", "-42.5", "1e-10", "0.0", "1e12"]
    )
    def test_roundtrip(self, keyfiles, tmp_path, value):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        enc_file = tmp_path / "enc.json"
        r = runner.invoke(
            cli,
            ["encrypt", str(pub_file), "--output", str(enc_file), "--", value],
        )
        assert r.exit_code == 0, r.output
        payload = json.loads(enc_file.read_text())
        assert set(payload) == {"v", "e"}
        assert payload["e"] <= -32  # exponent pinning
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(enc_file)])
        assert r.exit_code == 0, r.output
        assert float(r.output.strip().splitlines()[-1]) == pytest.approx(float(value), rel=1e-12)

    def test_add_plain(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        enc = tmp_path / "a.json"
        out = tmp_path / "out.json"
        runner.invoke(
            cli, ["encrypt", str(pub_file), "--output", str(enc), "1.5"]
        )
        r = runner.invoke(
            cli,
            ["add", str(pub_file), str(enc), "--output", str(out), "2.25"],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(out)])
        assert float(r.output.strip().splitlines()[-1]) == 3.75

    def test_addenc(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        a, b, out = (tmp_path / x for x in ("a.json", "b.json", "out.json"))
        runner.invoke(cli, ["encrypt", str(pub_file), "--output", str(a), "10"])
        runner.invoke(
            cli, ["encrypt", str(pub_file), "--output", str(b), "--", "-4.5"]
        )
        r = runner.invoke(
            cli,
            ["addenc", str(pub_file), str(a), str(b), "--output", str(out)],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(out)])
        assert float(r.output.strip().splitlines()[-1]) == 5.5

    def test_multiply(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        enc, out = tmp_path / "a.json", tmp_path / "out.json"
        runner.invoke(
            cli, ["encrypt", str(pub_file), "--output", str(enc), "6.0"]
        )
        r = runner.invoke(
            cli,
            ["multiply", str(pub_file), "--output", str(out), "--",
             str(enc), "-7"],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(out)])
        assert float(r.output.strip().splitlines()[-1]) == -42.0


@pytest.mark.skipif(ref_cli is None, reason="reference CLI unavailable")
class TestReferenceInterop:
    """Cross-tool wire compatibility with the upstream pheutil."""

    def test_our_encrypt_their_decrypt(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        enc = tmp_path / "ours.json"
        r = runner.invoke(
            cli, ["encrypt", str(pub_file), "--output", str(enc), "123.456"]
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(
            ref_cli.cli, ["decrypt", str(priv_file), str(enc)]
        )
        assert r.exit_code == 0, r.output
        assert float(r.output.strip().splitlines()[-1]) == pytest.approx(
            123.456, rel=1e-12
        )

    def test_their_encrypt_our_decrypt(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        enc = tmp_path / "theirs.json"
        r = runner.invoke(
            ref_cli.cli,
            ["encrypt", str(pub_file), "--output", str(enc), "--", "-9.75"],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(enc)])
        assert r.exit_code == 0, r.output
        assert float(r.output.strip().splitlines()[-1]) == pytest.approx(-9.75, rel=1e-12)

    def test_their_keys_work_here(self, tmp_path):
        runner = CliRunner()
        priv_file = tmp_path / "ref_priv.json"
        r = runner.invoke(
            ref_cli.cli, ["genpkey", "--keysize", "256", str(priv_file)]
        )
        assert r.exit_code == 0, r.output
        priv = serial.private_key_from_jwk(json.loads(priv_file.read_text()))
        enc = priv.public_key.encrypt(55.5)
        assert priv.decrypt(enc) == 55.5


class TestBatchCommands:
    def test_encryptvec_decryptvec(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        vals = [1.5, -2.0, 300.0, 0.0625]
        values_file = tmp_path / "vals.json"
        values_file.write_text(json.dumps(vals))
        enc_file = tmp_path / "encvec.json"
        r = runner.invoke(
            cli,
            ["encryptvec", str(pub_file), str(values_file),
             "--output", str(enc_file)],
        )
        assert r.exit_code == 0, r.output
        payload = json.loads(enc_file.read_text())
        assert len(payload["values"]) == len(vals)
        r = runner.invoke(cli, ["decryptvec", str(priv_file), str(enc_file)])
        assert r.exit_code == 0, r.output
        assert json.loads(r.output.strip().splitlines()[-1]) == vals

    def test_sumvec(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        vals = [1.5, 2.5, -0.5, 10.0]
        values_file = tmp_path / "vals.json"
        values_file.write_text(json.dumps(vals))
        enc_file = tmp_path / "encvec.json"
        sum_file = tmp_path / "sum.json"
        runner.invoke(
            cli,
            ["encryptvec", str(pub_file), str(values_file),
             "--output", str(enc_file)],
        )
        r = runner.invoke(
            cli,
            ["sumvec", str(pub_file), str(enc_file), "--output", str(sum_file)],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(sum_file)])
        assert float(r.output.strip().splitlines()[-1]) == sum(vals)

    def test_addvec_addencvec_multiplyvec(self, keyfiles, tmp_path):
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        vals = [1.5, -2.0, 4.0]
        plain = [10.0, 0.5, -1.0]
        values_file = tmp_path / "vals.json"
        values_file.write_text(json.dumps(vals))
        plain_file = tmp_path / "plain.json"
        plain_file.write_text(json.dumps(plain))
        enc_file = tmp_path / "encvec.json"
        runner.invoke(
            cli,
            ["encryptvec", str(pub_file), str(values_file),
             "--output", str(enc_file)],
        )
        added = tmp_path / "added.json"
        r = runner.invoke(
            cli,
            ["addvec", str(pub_file), str(enc_file), str(plain_file),
             "--output", str(added)],
        )
        assert r.exit_code == 0, r.output
        doubled = tmp_path / "doubled.json"
        r = runner.invoke(
            cli,
            ["addencvec", str(pub_file), str(added), str(enc_file),
             "--output", str(doubled)],
        )
        assert r.exit_code == 0, r.output
        scaled = tmp_path / "scaled.json"
        r = runner.invoke(
            cli,
            ["multiplyvec", str(pub_file), str(doubled), str(plain_file),
             "--output", str(scaled)],
        )
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["decryptvec", str(priv_file), str(scaled)])
        assert r.exit_code == 0, r.output
        got = json.loads(r.output.strip().splitlines()[-1])
        want = [(2 * v + p) * p for v, p in zip(vals, plain)]
        assert got == pytest.approx(want, rel=1e-10)

    def test_vector_format_elements_reference_compatible(
        self, keyfiles, tmp_path
    ):
        # Every element of the batch wire format is itself a valid
        # single-ciphertext {"v","e"} payload for the scalar decrypt path.
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        values_file = tmp_path / "vals.json"
        values_file.write_text(json.dumps([7.25]))
        enc_file = tmp_path / "encvec.json"
        runner.invoke(
            cli,
            ["encryptvec", str(pub_file), str(values_file),
             "--output", str(enc_file)],
        )
        element = json.loads(enc_file.read_text())["values"][0]
        single = tmp_path / "single.json"
        single.write_text(json.dumps(element))
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(single)])
        assert float(r.output.strip().splitlines()[-1]) == 7.25


class TestFuzz:
    """Randomized CLI pipelines, mirroring phe/tests/cli_test.py:348-398.

    Scalar commands are host-only (fast), so these loops run at the
    reference's iteration counts against a shared 256-bit key.
    """

    def _encrypt(self, runner, pub_file, tmp_path, name, value):
        f = tmp_path / ("%s.json" % name)
        r = runner.invoke(
            cli,
            ["encrypt", str(pub_file), "--output", str(f), "--", repr(value)],
        )
        assert r.exit_code == 0, r.output
        return f

    def _decrypt(self, runner, priv_file, f):
        r = runner.invoke(cli, ["decrypt", str(priv_file), str(f)])
        assert r.exit_code == 0, r.output
        return float(r.output.strip().splitlines()[-1])

    def test_add_random_ints(self, keyfiles, tmp_path):
        import random as _random

        rng = _random.Random(101)
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        out = tmp_path / "out.json"
        for i in range(20):
            a = rng.randrange(-(10**15), 10**15)
            b = rng.randrange(-(10**15), 10**15)
            ea = self._encrypt(runner, pub_file, tmp_path, "a%d" % i, a)
            r = runner.invoke(
                cli,
                ["add", str(pub_file), str(ea), "--output", str(out), "--",
                 repr(b)],
            )
            assert r.exit_code == 0, r.output
            got = self._decrypt(runner, priv_file, out)
            assert got == pytest.approx(float(a + b))

    def test_addenc_random_floats(self, keyfiles, tmp_path):
        import random as _random

        rng = _random.Random(202)
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        out = tmp_path / "out.json"
        for i in range(20):
            a, b = rng.random(), rng.random()
            ea = self._encrypt(runner, pub_file, tmp_path, "fa%d" % i, a)
            eb = self._encrypt(runner, pub_file, tmp_path, "fb%d" % i, b)
            r = runner.invoke(
                cli,
                ["addenc", str(pub_file), str(ea), str(eb),
                 "--output", str(out)],
            )
            assert r.exit_code == 0, r.output
            got = self._decrypt(runner, priv_file, out)
            assert got == pytest.approx(float(a + b))

    def test_multiply_random_ints(self, keyfiles, tmp_path):
        import random as _random

        rng = _random.Random(303)
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        out = tmp_path / "out.json"
        for i in range(20):
            a = rng.randrange(-10000, 10000)
            b = rng.randrange(-10000, 10000)
            ea = self._encrypt(runner, pub_file, tmp_path, "m%d" % i, a)
            r = runner.invoke(
                cli,
                ["multiply", str(pub_file), "--output", str(out), "--",
                 str(ea), repr(b)],
            )
            assert r.exit_code == 0, r.output
            got = self._decrypt(runner, priv_file, out)
            assert got == pytest.approx(float(a * b))

    def test_pipeline_random_mix(self, keyfiles, tmp_path):
        # Chained add -> addenc -> multiply pipelines with random operands
        # (the composite shape of the reference's fuzz class).
        import random as _random

        rng = _random.Random(404)
        d, priv_file, pub_file = keyfiles
        runner = CliRunner()
        for i in range(10):
            a, b = rng.random() * 100, rng.random() * 100
            c = rng.randrange(-50, 50)
            k = rng.randrange(-20, 20)
            ea = self._encrypt(runner, pub_file, tmp_path, "pa%d" % i, a)
            eb = self._encrypt(runner, pub_file, tmp_path, "pb%d" % i, b)
            s1 = tmp_path / "s1.json"
            r = runner.invoke(
                cli,
                ["addenc", str(pub_file), str(ea), str(eb),
                 "--output", str(s1)],
            )
            assert r.exit_code == 0, r.output
            s2 = tmp_path / "s2.json"
            r = runner.invoke(
                cli,
                ["add", str(pub_file), str(s1), "--output", str(s2), "--",
                 repr(c)],
            )
            assert r.exit_code == 0, r.output
            s3 = tmp_path / "s3.json"
            r = runner.invoke(
                cli,
                ["multiply", str(pub_file), "--output", str(s3), "--",
                 str(s2), repr(k)],
            )
            assert r.exit_code == 0, r.output
            got = self._decrypt(runner, priv_file, s3)
            assert got == pytest.approx(float((a + b + c) * k))
