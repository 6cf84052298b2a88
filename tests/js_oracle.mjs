// Test-only differential oracle: evaluates the reference's documented
// scalar semantics (SURVEY.md §2.3/§2.11, citing /root/reference/src/
// scrapeDocument.ts:192-214 and scrapeDocument/detectors.ts:13-28) in real
// JS so the Python port can be checked byte-for-byte under true JS regex /
// trim / WHATWG-URL behavior. Reads a JSON request on stdin:
//   {"op": "strip"|"meta"|"entities"|"resolve"|"detect_regexes", "args": [...]}
// (batched: args is a list of inputs), writes JSON results on stdout.

const stripHtmlToText = (html) =>
  html
    .replace(/<script\b[^<]*(?:(?!<\/script>)<[^<]*)*<\/script>/gi, '')
    .replace(/<style\b[^<]*(?:(?!<\/style>)<[^<]*)*<\/style>/gi, '')
    .replace(/<[^>]+>/g, ' ')
    .replace(/\s+/g, ' ')
    .trim();

const extractMeta = (html) => {
  const t = html.match(/<title[^>]*>([^<]+)<\/title>/i);
  const d = html.match(/<meta[^>]+name=["']description["'][^>]+content=["']([^"']+)["']/i);
  return [t?.[1]?.trim() ?? null, d?.[1]?.trim() ?? null];
};

const decodeEntities = (v) =>
  v
    .replace(/&amp;/g, '&')
    .replace(/&quot;/g, '"')
    .replace(/&#039;/g, "'")
    .replace(/&lt;/g, '<')
    .replace(/&gt;/g, '>');

const resolve = ([href, base]) => {
  try {
    return new URL(href, base ?? undefined).toString();
  } catch {
    return null;
  }
};

const detectRegexes = ([url, html]) => {
  // first-match href extraction regexes from detectors.ts:53,66,100-102,126-130
  const pick = (re) => html.match(re)?.[1] ?? null;
  return [
    pick(/href=["']([^"']*wpdmdl=\d+[^"']*)["']/i),
    pick(/href=["']([^"']*\.pdf[^"']*)["']/i),
    pick(/href=["'](\/filepro\/document\/\d+\/[^"']+\.pdf)["']/i),
    pick(/href=["'](\/dsweb\/Get\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i),
    pick(/href=["'](\/dsweb\/ServicesLib\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i),
  ];
};

// Full detectDocumentUrl chain (detectors.ts:30-193) under true JS string /
// regex / WHATWG-URL semantics — drives the 17-fixture differential test.
const makeAbsoluteUrl = (url, base) => {
  const decoded = decodeEntities(url);
  try {
    return new URL(decoded, base).toString();
  } catch {
    return decoded;
  }
};

const extractWordPress = (url, html) => {
  if (url.includes('wpdmdl=')) return null;
  const isWpdm =
    url.includes('/download/') ||
    html.includes('wpdm-download-link') ||
    html.includes('wpdm_view_count');
  if (!isWpdm) return null;
  const wpdm = html.match(/href=["']([^"']*wpdmdl=\d+[^"']*)["']/i);
  if (wpdm) return makeAbsoluteUrl(wpdm[1], url);
  const pdf = html.match(/href=["']([^"']*\.pdf[^"']*)["']/i);
  if (pdf) return makeAbsoluteUrl(pdf[1], url);
  return null;
};

const extractCivicWeb = (url, html) => {
  const isPreview =
    url.includes('/filepro/documents/?preview=') ||
    (url.includes('civicweb.net') && url.includes('/filepro/documents'));
  if (!isPreview) return null;
  const m = html.match(/href=["'](\/filepro\/document\/\d+\/[^"']+\.pdf)["']/i);
  return m ? makeAbsoluteUrl(m[1], url) : null;
};

const extractDocuShare = (url, html) => {
  const isDs =
    url.includes('/docushare/dsweb/') ||
    url.includes('DocuShare') ||
    html.includes('DocuShare') ||
    html.includes('/dsweb/Get/') ||
    html.includes('/dsweb/ServicesLib/');
  if (!isDs) return null;
  const patterns = [
    /href=["'](\/dsweb\/Get\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i,
    /href=["'](\/dsweb\/ServicesLib\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i,
    /href=["'](\/[^"']*(?:docushare|dsweb)[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i,
  ];
  for (const p of patterns) {
    const m = html.match(p);
    if (m) return makeAbsoluteUrl(m[1], url);
  }
  return null;
};

const detect = ([url, html]) => {
  const wp = extractWordPress(url, html);
  if (wp)
    return { url: wp, type: 'application/pdf', is_pdf: true, strategy: 'wordpress-pdf-link' };
  const cw = extractCivicWeb(url, html);
  if (cw)
    return { url: cw, type: 'application/pdf', is_pdf: true, strategy: 'civicweb-pdf-link' };
  const ds = extractDocuShare(url, html);
  if (ds) {
    const isPdf = ds.toLowerCase().endsWith('.pdf');
    return {
      url: ds,
      type: isPdf ? 'application/pdf' : 'application/octet-stream',
      is_pdf: isPdf,
      strategy: 'docushare-doc-link',
    };
  }
  return null;
};

// createCacheKey / stableStringify (cache.ts:48-105) under true JS
// semantics, incl. the normalizeCacheKeyPart double-encoding.
import { createHash } from 'node:crypto';

const stableStringify = (value) => {
  if (value === undefined) return 'undefined';
  if (value === null) return 'null';
  if (
    typeof value === 'string' ||
    typeof value === 'number' ||
    typeof value === 'boolean'
  )
    return JSON.stringify(value);
  if (Array.isArray(value)) return `[${value.map(stableStringify).join(',')}]`;
  if (typeof value === 'object') {
    const entries = Object.entries(value)
      .filter(([, v]) => v !== undefined)
      .sort(([a], [b]) => a.localeCompare(b));
    return `{${entries
      .map(([k, v]) => `${JSON.stringify(k)}:${stableStringify(v)}`)
      .join(',')}}`;
  }
  return JSON.stringify(String(value));
};

const cacheKey = ([namespace, url, parts]) => {
  const sig = (parts ?? [])
    .map((p) => (p === undefined ? undefined : stableStringify(p)))
    .filter((p) => p !== undefined);
  const signature = stableStringify({ parts: sig, url });
  return `${namespace}:${createHash('sha256').update(signature).digest('hex')}`;
};

// DomAdapter.processHtml (dom.ts:36-49) — the TRUE happy-dom differential
// for textops.normalize_html. happy-dom is not vendored in this sandbox
// (no network, installs forbidden), so the op degrades to a sentinel the
// Python test turns into an explicit skip; anywhere happy-dom IS
// resolvable (e.g. next to the reference's own node_modules) the
// byte-parity assertion activates automatically.
const makeNormalize = async () => {
  try {
    const { Window } = await import('happy-dom');
    return (html) => {
      try {
        const window = new Window();
        window.document.documentElement.innerHTML = html;
        return window.document.documentElement.outerHTML;
      } catch {
        return html;
      }
    };
  } catch {
    return () => ({ unavailable: 'happy-dom not installed' });
  }
};

let input = '';
process.stdin.on('data', (c) => (input += c));
process.stdin.on('end', async () => {
  const { op, args } = JSON.parse(input);
  const fn = {
    strip: stripHtmlToText,
    meta: extractMeta,
    entities: decodeEntities,
    resolve,
    detect_regexes: detectRegexes,
    detect,
    cache_key: cacheKey,
    normalize: op === 'normalize' ? await makeNormalize() : undefined,
  }[op];
  process.stdout.write(JSON.stringify(args.map(fn)));
});
