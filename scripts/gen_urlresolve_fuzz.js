// Seeded fuzz corpus for node_url_resolve parity (deterministic LCG).
// Run: node scripts/gen_urlresolve_fuzz.js > tests/data/urlresolve_fuzz.json
'use strict';
const url = require('url');
let seed = 0xC0FFEE;
function rnd() { seed = (seed * 1103515245 + 12345) & 0x7fffffff; return seed / 0x7fffffff; }
function pick(a) { return a[Math.floor(rnd() * a.length)]; }

const atoms = ['a', 'bb', 'c-d', '..', '.', '', 'E', '%7e', '%zz', 'ü',
               "q'r", '{x}', '|', '^', '`', '<t>', '"v"', 'w w', 'x\\y',
               '\\', '@h', ':81', 'k=v', 's;t', '100%'];
const seps = ['/', '\\', '//', ''];
const prefixes = ['', '/', '\\', '//', '../', './', '?', '#', '//h.COM',
                  'http://H.x', 'mailto:', 'weird:'];
function mkHref() {
  let s = pick(prefixes);
  const n = 1 + Math.floor(rnd() * 4);
  for (let i = 0; i < n; i++) s += pick(seps) + pick(atoms);
  if (rnd() < 0.3) s += '?' + pick(atoms) + (rnd() < 0.5 ? '\\' + pick(atoms) : '');
  if (rnd() < 0.3) s += '#' + pick(atoms);
  return s;
}
const bases = ['http://example.com', 'https://Sub.EXAMPLE.org/a/b/c?q=1#f',
               'http://u:p@h.test:8080/x/', 'https://example.com/%7Eu/d/'];
const out = [];
for (let i = 0; i < 800; i++) {
  const b = pick(bases), h = mkHref();
  let r;
  try { r = url.resolve(b, h); } catch (e) { r = { error: e.constructor.name }; }
  out.push([b, h, r]);
}
process.stdout.write(JSON.stringify(out));
