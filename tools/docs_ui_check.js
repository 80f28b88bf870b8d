// Dev tool: validate the interactive /docs browser end to end.
// Boot a gateway first (sbt "runMain graft.tools.GatewayDev"), then
//   node tools/docs_ui_check.js
// Extracts the inline script from the /docs HTML and runs it against the
// live OpenAPI spec under a minimal DOM stub: asserts one card per
// operation, the parameter table, and that the try-it runner substitutes
// path parameters (this check caught the missing series_uuid path
// parameter in the spec).
const http = require('http');
function get(path, accept) {
  return new Promise((res, rej) => {
    http.get({host:'127.0.0.1', port:18080, path, headers:{accept}}, r => {
      let b=''; r.on('data', c=>b+=c); r.on('end', ()=>res({status:r.statusCode, body:b}));
    }).on('error', rej);
  });
}
function el(tag) {
  return {
    tag, children: [], _text: '', className:'', hidden:false,
    placeholder:'', value:'', innerHTML:'',
    set textContent(t){ this._text=String(t); this.children=[]; },
    get textContent(){ return this._text + this.children.map(c=>typeof c==='string'?c:c.textContent).join(''); },
    append(...xs){ this.children.push(...xs); },
  };
}
(async () => {
  const html = (await get('/docs', 'text/html')).body;
  const m = html.match(/<script>([\s\S]*)<\/script>/);
  if (!m) throw new Error('no inline script');
  const script = m[1];
  const ops = el('div');
  const document = { getElementById: id => { if(id!=='ops') throw new Error(id); return ops; },
                     createElement: el };
  const specBody = (await get('/docs', 'application/json')).body;
  const fetchStub = (url, opts) => Promise.resolve({
    json: () => Promise.resolve(JSON.parse(specBody)),
    text: () => Promise.resolve('stub'), status: 200 });
  // run the page script
  await new Function('fetch', 'document', script)(fetchStub, document);
  await new Promise(r => setTimeout(r, 50)); // let promise chain settle
  const cards = ops.children.filter(c => c.tag === 'details');
  const spec = JSON.parse(specBody);
  const expected = Object.values(spec.paths).reduce((n,i)=>n+Object.keys(i).length, 0);
  console.log('cards:', cards.length, 'expected ops:', expected);
  if (cards.length !== expected) throw new Error('card count mismatch');
  // a GET card must carry a try-it button; find /series/{series_uuid}
  const series = cards.find(c => c.children.some(ch => ch.tag==='summary' && ch.textContent.includes('/series/{series_uuid}')));
  if (!series) throw new Error('series card missing');
  const btn = series.children.find(c => c.tag === 'button');
  if (!btn || btn.textContent !== 'try it') throw new Error('try-it missing');
  // parameter inputs rendered
  const table = series.children.find(c => c.tag === 'table');
  if (!table) throw new Error('param table missing');
  // exercise the try-it click with a path param substituted
  let fetched = null;
  const fetch2 = (u) => { fetched = u; return Promise.resolve({status:200, text:()=>Promise.resolve('ok')}); };
  // re-run with capturing fetch to wire onclick closures to fetch2
  const ops2 = el('div');
  const document2 = { getElementById: () => ops2, createElement: el };
  await new Function('fetch', 'document', script)((u,o)=> u==='/docs'||o ? fetchStub(u,o) : fetch2(u), document2);
  await new Promise(r => setTimeout(r, 50));
  const cards2 = ops2.children.filter(c => c.tag === 'details');
  const s2 = cards2.find(c => c.children.some(ch => ch.tag==='summary' && ch.textContent.includes('/series/{series_uuid}')));
  const btn2 = s2.children.find(c => c.tag === 'button');
  // set the path param input value via the table input elements
  const tbl2 = s2.children.find(c => c.tag === 'table');
  for (const tr of tbl2.children) {
    const tds = tr.children;
    if (tds[0] && tds[0].textContent === 'series_uuid') tds[3].children[0].value = 'abc-123';
  }
  btn2.onclick();
  await new Promise(r => setTimeout(r, 50));
  console.log('try-it fetched:', fetched);
  if (!fetched || !fetched.startsWith('/series/abc-123')) throw new Error('path substitution failed: ' + fetched);
  console.log('DOCS_UI_OK');
})().catch(e => { console.error('FAIL', e); process.exit(1); });
