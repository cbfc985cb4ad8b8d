"""Operator algebra over Paillier ciphertexts (the scalar, host-int API).

Behavioural contract (SURVEY.md §7 items 6-8, phe/paillier.py:442-752):

* ``+`` dispatches on EncryptedNumber / EncodedNumber / scalar; ``sum()`` and
  numpy object arrays work through ``__radd__`` / ``__rmul__``.
* enc x enc multiplication raises NotImplementedError; ``/`` multiplies by
  the reciprocal.
* adding aligns exponents by multiplying the higher-exponent operand by
  BASE**diff (phe/paillier.py:664-669); scalar adds encode at
  max_exponent=self.exponent (:640-641); multiplying adds exponents (:515).
* the lazy obfuscation state machine: results of + and * are NOT obfuscated;
  ``ciphertext(be_secure=True)`` obfuscates on first secure read
  (:531-568, :603-624).
* ``_raw_mul`` uses the modular-inverse trick for plaintexts in the negative
  window so the effective exponent stays small (:721-751).

This module is deliberately host-only: one EncryptedNumber wraps one CPython
int ciphertext, mirroring the reference's API for drop-in parity. Bulk work
belongs in phe_tpu.batch, which carries thousands of ciphertexts as limb
tensors on the TPU and interoperates with this class via
``phe_tpu.batch.EncryptedBatch.from_encrypted_numbers`` / ``.to_encrypted_numbers``.
"""

from phe_tpu.encoding import EncodedNumber
from phe_tpu.keys import PaillierPublicKey
from phe_tpu.utils.ntheory import invert, mulmod, powmod


class EncryptedNumber(object):
    """One Paillier ciphertext with its encoding exponent.

    D(E(a) * E(b)) = a + b and D(E(a)**k) = a * k; the operator overloads
    below expose this as ordinary + and * against plaintext scalars and
    other ciphertexts (reference: phe/paillier.py:442-488).
    """

    def __init__(self, public_key, ciphertext, exponent=0):
        self.public_key = public_key
        self.__ciphertext = ciphertext
        self.exponent = exponent
        self.__is_obfuscated = False
        if isinstance(self.ciphertext, EncryptedNumber):
            raise TypeError("ciphertext should be an integer")
        if not isinstance(self.public_key, PaillierPublicKey):
            raise TypeError("public_key should be a PaillierPublicKey")

    def __add__(self, other):
        if isinstance(other, EncryptedNumber):
            return self._add_encrypted(other)
        elif isinstance(other, EncodedNumber):
            return self._add_encoded(other)
        else:
            return self._add_scalar(other)

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, other):
        """Multiply by an int, float or EncodedNumber scalar."""
        if isinstance(other, EncryptedNumber):
            raise NotImplementedError("Good luck with that...")

        if isinstance(other, EncodedNumber):
            encoding = other
        else:
            encoding = EncodedNumber.encode(self.public_key, other)
        product = self._raw_mul(encoding.encoding)
        exponent = self.exponent + encoding.exponent

        return EncryptedNumber(self.public_key, product, exponent)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __sub__(self, other):
        return self + (other * -1)

    def __rsub__(self, other):
        return other + (self * -1)

    def __truediv__(self, scalar):
        return self.__mul__(1 / scalar)

    def ciphertext(self, be_secure=True):
        """The raw int ciphertext, obfuscating first if be_secure.

        Sums and products skip the expensive r^n blinding; any ciphertext
        that leaves trust boundaries must be read with be_secure=True, which
        obfuscates on demand (reference: phe/paillier.py:531-568).
        """
        if be_secure and not self.__is_obfuscated:
            self.obfuscate()

        return self.__ciphertext

    def decrease_exponent_to(self, new_exp):
        """Same value, lower exponent: multiply by BASE**(old-new).

        Reference: phe/paillier.py:570-601.
        """
        if new_exp > self.exponent:
            raise ValueError(
                "New exponent %i should be more negative than "
                "old exponent %i" % (new_exp, self.exponent)
            )
        multiplied = self * pow(EncodedNumber.BASE, self.exponent - new_exp)
        multiplied.exponent = new_exp
        return multiplied

    def obfuscate(self):
        """Blind the ciphertext with a fresh r^n factor.

        Reference: phe/paillier.py:603-624. Required before sharing any
        ciphertext derived by homomorphic ops from known ciphertexts.
        """
        r = self.public_key.get_random_lt_n()
        r_pow_n = powmod(r, self.public_key.n, self.public_key.nsquare)
        self.__ciphertext = mulmod(
            self.__ciphertext, r_pow_n, self.public_key.nsquare
        )
        self.__is_obfuscated = True

    def _add_scalar(self, scalar):
        """E(a) + b: encode b at this ciphertext's exponent and add.

        Reference: phe/paillier.py:626-643.
        """
        encoded = EncodedNumber.encode(
            self.public_key, scalar, max_exponent=self.exponent
        )
        return self._add_encoded(encoded)

    def _add_encoded(self, encoded):
        """E(a) + encoded b via E(a) * E(b) mod n^2 with r=1.

        Aligns exponents first (reference: phe/paillier.py:645-676).
        """
        if self.public_key != encoded.public_key:
            raise ValueError(
                "Attempted to add numbers encoded against "
                "different public keys!"
            )

        a, b = self, encoded
        if a.exponent > b.exponent:
            a = self.decrease_exponent_to(b.exponent)
        elif a.exponent < b.exponent:
            b = b.decrease_exponent_to(a.exponent)

        # r=1: no blinding inside a local computation (lazy obfuscation).
        encrypted_scalar = a.public_key.raw_encrypt(b.encoding, 1)

        sum_ciphertext = a._raw_add(a.ciphertext(False), encrypted_scalar)
        return EncryptedNumber(a.public_key, sum_ciphertext, a.exponent)

    def _add_encrypted(self, other):
        """E(a) + E(b) = E(a) * E(b) mod n^2 after exponent alignment.

        Reference: phe/paillier.py:678-703.
        """
        if self.public_key != other.public_key:
            raise ValueError(
                "Attempted to add numbers encrypted against "
                "different public keys!"
            )

        a, b = self, other
        if a.exponent > b.exponent:
            a = self.decrease_exponent_to(b.exponent)
        elif a.exponent < b.exponent:
            b = b.decrease_exponent_to(a.exponent)

        sum_ciphertext = a._raw_add(a.ciphertext(False), b.ciphertext(False))
        return EncryptedNumber(a.public_key, sum_ciphertext, a.exponent)

    def _raw_add(self, e_a, e_b):
        """Homomorphic add of raw ciphertext ints: product mod n^2.

        Reference: phe/paillier.py:705-719.
        """
        return mulmod(e_a, e_b, self.public_key.nsquare)

    def _raw_mul(self, plaintext):
        """Raw scalar multiply: ciphertext**plaintext mod n^2.

        For plaintexts in the negative window, exponentiates the ciphertext
        inverse by n - plaintext to keep the exponent small
        (reference: phe/paillier.py:721-751).
        """
        if not isinstance(plaintext, int):
            raise TypeError(
                "Expected ciphertext to be int, not %s" % type(plaintext)
            )

        if plaintext < 0 or plaintext >= self.public_key.n:
            raise ValueError("Scalar out of bounds: %i" % plaintext)

        if self.public_key.n - self.public_key.max_int <= plaintext:
            neg_c = invert(self.ciphertext(False), self.public_key.nsquare)
            neg_scalar = self.public_key.n - plaintext
            return powmod(neg_c, neg_scalar, self.public_key.nsquare)
        else:
            return powmod(
                self.ciphertext(False), plaintext, self.public_key.nsquare
            )
