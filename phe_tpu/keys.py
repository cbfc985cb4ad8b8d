"""Paillier key generation, public/private keys and the private keyring.

Behavioural contract (SURVEY.md §7 items 1-3, bit-exact vs the reference):

* keygen — phe/paillier.py:37-68: p, q random primes of n_length/2 bits,
  retried until ``n.bit_length() == n_length`` exactly, p != q enforced.
* public key — phe/paillier.py:86-90: g = n+1, nsquare = n*n,
  max_int = n//3 - 1; equality/hash on n.
* raw_encrypt — phe/paillier.py:102-139: (n*m + 1) mod n^2 via the g = n+1
  shortcut, the modular-inverse trick for plaintexts in (n - max_int, n),
  obfuscator r^n mod n^2.
* private key — phe/paillier.py:217-374: p < q normalised, CRT decrypt with
  precomputed hp/hq, ``from_totient`` factorisation, equality/hash on (p, q).
* keyring — phe/paillier.py:383-439.

These classes are the host-facing scalar API. The TPU batch engine
(phe_tpu.batch) attaches per-key device state lazily via
``PaillierPublicKey.device_context`` / ``PaillierPrivateKey.device_context``
so that scalar and batched code share one key object.
"""

import secrets
from collections.abc import Mapping

from phe_tpu.encoding import EncodedNumber
from phe_tpu.utils.ntheory import getprimeover, invert, isqrt, mulmod, powmod

# Minimum 128-bit security (reference: phe/paillier.py:34).
DEFAULT_KEYSIZE = 3072


def generate_paillier_keypair(private_keyring=None, n_length=DEFAULT_KEYSIZE):
    """Generate a fresh keypair; optionally registering it on a keyring.

    Retries prime generation until the modulus has exactly n_length bits,
    with p != q (reference: phe/paillier.py:37-68).
    """
    p = q = n = None
    while n is None or n.bit_length() != n_length:
        p = getprimeover(n_length // 2)
        q = p
        while q == p:
            q = getprimeover(n_length // 2)
        n = p * q

    public_key = PaillierPublicKey(n)
    private_key = PaillierPrivateKey(public_key, p, q)

    if private_keyring is not None:
        private_keyring.add(private_key)

    return public_key, private_key


class PaillierPublicKey(object):
    """Paillier public key (n, g = n+1) with encryption methods.

    Attributes:
      n, g, nsquare, max_int: as in the reference (phe/paillier.py:86-90).
    """

    def __init__(self, n):
        self.g = n + 1
        self.n = n
        self.nsquare = n * n
        self.max_int = n // 3 - 1
        self._device_context = None

    def __repr__(self):
        return "<PaillierPublicKey {}>".format(hex(hash(self))[2:][:10])

    def __eq__(self, other):
        return self.n == other.n

    def __hash__(self):
        return hash(self.n)

    def device_context(self):
        """Packed per-key device state for the TPU batch engine (lazy)."""
        if self._device_context is None:
            from phe_tpu.batch import PublicDeviceContext

            self._device_context = PublicDeviceContext.build(self)
        return self._device_context

    def raw_encrypt(self, plaintext, r_value=None):
        """Raw Paillier encryption of an int residue mod n.

        Uses the g = n+1 shortcut (n*m + 1 mod n^2) and, for residues in the
        negative window, the modular-inverse trick that keeps the involved
        numbers small (reference: phe/paillier.py:102-139).
        """
        if not isinstance(plaintext, int):
            raise TypeError(
                "Expected int type plaintext but got: %s" % type(plaintext)
            )

        if self.n - self.max_int <= plaintext < self.n:
            neg_plaintext = self.n - plaintext
            neg_ciphertext = (self.n * neg_plaintext + 1) % self.nsquare
            nude_ciphertext = invert(neg_ciphertext, self.nsquare)
        else:
            nude_ciphertext = (self.n * plaintext + 1) % self.nsquare

        r = r_value or self.get_random_lt_n()
        obfuscator = powmod(r, self.n, self.nsquare)

        return mulmod(nude_ciphertext, obfuscator, self.nsquare)

    def get_random_lt_n(self):
        """Cryptographically random int in [1, n) (phe/paillier.py:141-143)."""
        return 1 + secrets.randbelow(self.n - 1)

    def encrypt(self, value, precision=None, r_value=None):
        """Encode then encrypt an int or float (phe/paillier.py:145-175)."""
        if isinstance(value, EncodedNumber):
            encoding = value
        else:
            encoding = EncodedNumber.encode(self, value, precision)

        return self.encrypt_encoded(encoding, r_value)

    def encrypt_encoded(self, encoding, r_value):
        """Encrypt an EncodedNumber (phe/paillier.py:177-194).

        With r_value None the heavy obfuscation modexp is applied through
        EncryptedNumber.obfuscate, preserving the lazy-obfuscation state
        machine of the reference.
        """
        from phe_tpu.encrypted import EncryptedNumber

        obfuscator = r_value or 1
        ciphertext = self.raw_encrypt(encoding.encoding, r_value=obfuscator)
        encrypted_number = EncryptedNumber(self, ciphertext, encoding.exponent)
        if r_value is None:
            encrypted_number.obfuscate()
        return encrypted_number


class PaillierPrivateKey(object):
    """Paillier private key with CRT-accelerated decryption.

    Stores p < q normalised and precomputes p^2, q^2, p^-1 mod q and the
    CRT constants hp, hq (reference: phe/paillier.py:217-235).
    """

    def __init__(self, public_key, p, q):
        if not p * q == public_key.n:
            raise ValueError("given public key does not match the given p and q.")
        if p == q:
            raise ValueError("p and q have to be different")
        self.public_key = public_key
        if q < p:
            self.p = q
            self.q = p
        else:
            self.p = p
            self.q = q
        self.psquare = self.p * self.p
        self.qsquare = self.q * self.q
        self.p_inverse = invert(self.p, self.q)
        self.hp = self.h_function(self.p, self.psquare)
        self.hq = self.h_function(self.q, self.qsquare)
        self._device_context = None

    @staticmethod
    def from_totient(public_key, totient):
        """Recover (p, q) from Euler's totient (phe/paillier.py:237-262)."""
        p_plus_q = public_key.n - totient + 1
        p_minus_q = isqrt(p_plus_q * p_plus_q - public_key.n * 4)
        q = (p_plus_q - p_minus_q) // 2
        p = p_plus_q - q
        if not p * q == public_key.n:
            raise ValueError("given public key and totient do not match.")
        return PaillierPrivateKey(public_key, p, q)

    def __repr__(self):
        return "<PaillierPrivateKey for {}>".format(repr(self.public_key))

    def device_context(self):
        """Packed per-key device state for batched CRT decryption (lazy)."""
        if self._device_context is None:
            from phe_tpu.batch import PrivateDeviceContext

            self._device_context = PrivateDeviceContext.build(self)
        return self._device_context

    def decrypt(self, encrypted_number):
        """Decrypt and decode (phe/paillier.py:268-291)."""
        encoded = self.decrypt_encoded(encrypted_number)
        return encoded.decode()

    def decrypt_encoded(self, encrypted_number, Encoding=None):
        """Decrypt to an EncodedNumber (phe/paillier.py:293-326).

        The optional Encoding class supports alternative bases, as in
        examples/alternative_base.py.
        """
        from phe_tpu.encrypted import EncryptedNumber

        if not isinstance(encrypted_number, EncryptedNumber):
            raise TypeError(
                "Expected encrypted_number to be an EncryptedNumber"
                " not: %s" % type(encrypted_number)
            )

        if self.public_key != encrypted_number.public_key:
            raise ValueError(
                "encrypted_number was encrypted against a different key!"
            )

        if Encoding is None:
            Encoding = EncodedNumber

        encoded = self.raw_decrypt(encrypted_number.ciphertext(be_secure=False))
        return Encoding(self.public_key, encoded, encrypted_number.exponent)

    def raw_decrypt(self, ciphertext):
        """CRT decryption of a raw int ciphertext (phe/paillier.py:328-354)."""
        if not isinstance(ciphertext, int):
            raise TypeError(
                "Expected ciphertext to be an int, not: %s" % type(ciphertext)
            )

        decrypt_to_p = mulmod(
            self.l_function(powmod(ciphertext, self.p - 1, self.psquare), self.p),
            self.hp,
            self.p,
        )
        decrypt_to_q = mulmod(
            self.l_function(powmod(ciphertext, self.q - 1, self.qsquare), self.q),
            self.hq,
            self.q,
        )
        return self.crt(decrypt_to_p, decrypt_to_q)

    def h_function(self, x, xsquare):
        """Paillier's h-function for CRT decryption (phe/paillier.py:356-360)."""
        return invert(
            self.l_function(powmod(self.public_key.g, x - 1, xsquare), x), x
        )

    def l_function(self, x, p):
        """L(x, p) = (x - 1) // p (phe/paillier.py:362-364)."""
        return (x - 1) // p

    def crt(self, mp, mq):
        """Recombine the mod-p and mod-q residues (phe/paillier.py:366-374)."""
        u = mulmod(mq - mp, self.p_inverse, self.q)
        return mp + (u * self.p)

    def __eq__(self, other):
        return self.p == other.p and self.q == other.q

    def __hash__(self):
        return hash((self.p, self.q))


class PaillierPrivateKeyring(Mapping):
    """Mapping from public key to private key (phe/paillier.py:383-439)."""

    def __init__(self, private_keys=None):
        if private_keys is None:
            private_keys = []
        self.__keyring = {k.public_key: k for k in private_keys}

    def __getitem__(self, key):
        return self.__keyring[key]

    def __len__(self):
        return len(self.__keyring)

    def __iter__(self):
        return iter(self.__keyring)

    def __delitem__(self, public_key):
        del self.__keyring[public_key]

    def add(self, private_key):
        """Register a private key, keyed by its public key."""
        if not isinstance(private_key, PaillierPrivateKey):
            raise TypeError(
                "private_key should be of type PaillierPrivateKey, "
                "not %s" % type(private_key)
            )
        self.__keyring[private_key.public_key] = private_key

    def decrypt(self, encrypted_number):
        """Decrypt with whichever stored key matches the ciphertext's."""
        relevant_private_key = self.__keyring[encrypted_number.public_key]
        return relevant_private_key.decrypt(encrypted_number)
